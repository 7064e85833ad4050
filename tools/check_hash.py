#!/usr/bin/env python3
"""Local reproduction of the driver's correctness compare (VERDICT r2 item 3).

Rounds 1-2 taught us the hard way that a builder-side compare which proves
"values are identical" does NOT prove the driver's hash matches: the driver
hashes the Spark parquet output and the DuckDB oracle result through pandas,
where e.g. DECIMAL columns arrive as different Python object classes
(pyarrow -> decimal.Decimal vs duckdb -> float64) with different string
forms. This script pushes BOTH results through one shared canonicalization
(pandas -> sorted columns -> stringified cells -> sha256) so a type-class
mismatch shows up locally as a hash mismatch, the same way it does in
CORRECTNESS_r{N}.json.

Usage: python3 tools/check_hash.py <verifyOutDir> <sfDir>
  where <verifyOutDir> is what graft.Verify wrote (per-query parquet dirs +
  oracle_sql.json) and <sfDir> is e.g. /root/testdata/sf0.01.

This is a builder-side tool only; the shipped library has no Python
dependency.
"""
import glob
import hashlib
import json
import os
import sys

import duckdb
import pandas as pd


def canonical(df: pd.DataFrame) -> tuple[str, list[str], int]:
    cols = sorted(df.columns)
    df = df[cols]

    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "\x00NULL"
        if pd.api.types.is_scalar(v) and pd.isna(v):
            return "\x00NULL"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, bytes):
            return "0x" + v.hex()
        return f"{type(v).__name__}:{v}"

    rows = sorted(
        "\x01".join(cell(v) for v in rec) for rec in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode("utf-8", "surrogatepass"))
        h.update(b"\x02")
    return h.hexdigest(), cols, len(rows)


def main() -> int:
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    n_pass = 0
    n_total = 0
    for q in sorted(oracle):
        spark_dir = os.path.join(out_dir, q)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"{q}: MISSING spark output")
            continue
        n_total += 1
        sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            odf = con.sql(oracle[q]).df()
        except Exception as e:
            print(f"{q}: ORACLE ERROR {e}")
            continue
        sh, scols, srows = canonical(sdf)
        oh, ocols, orows = canonical(odf)
        ok = sh == oh
        n_pass += ok
        status = "ok" if ok else "HASH MISMATCH"
        detail = ""
        if not ok:
            if scols != ocols:
                detail = f" cols spark={scols} oracle={ocols}"
            elif srows != orows:
                detail = f" rows spark={srows} oracle={orows}"
            else:
                # find first differing cell for diagnosis
                sd = sdf[sorted(sdf.columns)]
                od = odf[sorted(odf.columns)]
                detail = (
                    f" dtypes spark={list(map(str, sd.dtypes))}"
                    f" oracle={list(map(str, od.dtypes))}"
                )
        print(f"{q}: {status} ({srows} rows){detail}")
    print(f"\n{n_pass}/{n_total} hash-green (local driver-style compare)")
    return 0 if n_pass == n_total else 1


if __name__ == "__main__":
    sys.exit(main())
