"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` on the same
sf dir, compares row count + column names/types + order-insensitive
value hash (columns sorted by name, rows sorted by stringified value).

Usage: python tools/check_parity.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 2**52:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_digest(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    argv = [a for a in sys.argv[1:] if a != "--default-session"]
    # --default-session replicates the external driver gate: Spark's
    # default case-INsensitive resolution and 200 shuffle partitions
    # (the round-2 sampling failure only reproduced under this config).
    default_session = "--default-session" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    import __spark_entry__ as entrymod
    from osprey_spark.session import build_session

    if default_session:
        spark = build_session(
            master="local[8]", shuffle_partitions=200, case_sensitive=False
        )
    else:
        spark = build_session(master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc(limit=5)
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only, {time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            od = con.execute(oracles[name])
            orows = od.fetchall()
            ocols = [d[0] for d in od.description]
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(ocols)}")
        if not problems:
            sh = table_digest([tuple(r) for r in srows], scols)
            oh = table_digest(orows, ocols)
            if sh != oh:
                problems.append(f"valuehash spark={sh} duck={oh}")
                # show first diff
                so = sorted(
                    "|".join(norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in [tuple(x) for x in srows]
                )
                oo = sorted(
                    "|".join(norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))
                    for r in orows
                )
                for a, b in zip(so, oo):
                    if a != b:
                        print(f"      first diff:\n      spark: {a}\n      duck : {b}")
                        break
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
