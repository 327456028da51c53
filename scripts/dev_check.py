#!/usr/bin/env python3
"""Dev-only oracle harness (mirrors the driver's t2 gate; not part of the
engine). Usage:
    python3 scripts/dev_check.py <sfDir> <verifyOutDir>
Loads each <verifyOutDir>/<name> parquet written by graft.Verify, runs the
matching oracle_sql.json query in DuckDB against <sfDir>/*.parquet, and
compares: column names (sorted), row counts, and a canonical hash of sorted
rows with floats at 6 significant digits.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        # Full-precision shortest round-trip repr — mirrors the driver's
        # strict hashing (round-1 lesson: 6-sig-digit canon let three
        # order-of-accumulation divergences through that the driver caught).
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon_rows = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    # multimodal_binary_ingest's read_blob glob is pinned to the driver's
    # verify scale (sf0.01 — oracle SQL cannot receive the dir argument);
    # for local runs at other scales, point it at the sf under test so the
    # dev signal stays meaningful
    oracle = {k: v.replace("/root/testdata/sf0.01/", sf_dir.rstrip("/") + "/")
              for k, v in oracle.items()}

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        grows, gcols = got.fetchall(), [c for c in got.columns]
        if name not in oracle:
            if len(grows) == 0:
                n_fail += 1
                print(f"  {name:32s} EMPTY  rows=0 (rows-only query returned nothing)")
            else:
                n_rowsonly += 1
                print(f"  {name:32s} ROWS-ONLY  rows={len(grows)}")
            continue
        try:
            exp = con.sql(oracle[name])
            erows, ecols = exp.fetchall(), [c for c in exp.columns]
        except Exception as e:
            n_fail += 1
            print(f"  {name:32s} ORACLE-SQL-ERROR: {e}")
            continue
        if sorted(gcols) != sorted(ecols):
            n_fail += 1
            print(f"  {name:32s} COLS-MISMATCH got={sorted(gcols)} exp={sorted(ecols)}")
            continue
        # Type-stability audit (round-2 lesson): this script fetches Python
        # values, where DuckDB HUGEINT and Spark int64 stringify the same —
        # but the DRIVER canonicalizes via the column type, so an oracle
        # column whose DuckDB type is HUGEINT (integer sum()) or DECIMAL
        # hash-fails there even with identical values. Benign width drift
        # (INTEGER vs BIGINT) canonicalizes identically and is allowed.
        gtypes = dict(zip(gcols, [str(t) for t in got.types]))
        etypes = dict(zip(ecols, [str(t) for t in exp.types]))
        hazard = {c: (gtypes[c], etypes[c]) for c in gtypes
                  if gtypes[c] != etypes[c]
                  and any(h in gtypes[c] + etypes[c]
                          for h in ("HUGEINT", "DECIMAL", "FLOAT"))}
        if hazard:
            n_fail += 1
            print(f"  {name:32s} TYPE-HAZARD {hazard} "
                  "(CAST the oracle column to the Spark output type)")
            continue
        if len(grows) != len(erows):
            n_fail += 1
            print(f"  {name:32s} ROWS-MISMATCH got={len(grows)} exp={len(erows)}")
            continue
        gh, eh = table_hash(grows, gcols), table_hash(erows, ecols)
        if gh == eh:
            n_pass += 1
            print(f"  {name:32s} PASS rows={len(grows)}")
        else:
            n_fail += 1
            print(f"  {name:32s} HASH-MISMATCH rows={len(grows)}")
            # show first differing canonical rows
            order_g = sorted(range(len(gcols)), key=lambda i: gcols[i])
            order_e = sorted(range(len(ecols)), key=lambda i: ecols[i])
            cg = sorted("|".join(canon(r[i]) for i in order_g) for r in grows)
            ce = sorted("|".join(canon(r[i]) for i in order_e) for r in erows)
            for a, b in zip(cg, ce):
                if a != b:
                    print(f"    got: {a}\n    exp: {b}")
                    break
    print(f"\nPASS={n_pass} FAIL={n_fail} ROWS-ONLY={n_rowsonly}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
