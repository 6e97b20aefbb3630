#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle differential check.

Dev-only tooling (not part of the Scala library): after `sbt "runMain
graft.Verify <sfDir> <outDir>"`, compares each <outDir>/<name> parquet
against the oracle SQL in <outDir>/oracle_sql.json executed by DuckDB over
the same sf tables. Usage: tools/check.py <sfDir> <outDir>
"""
import json
import sys

import duckdb


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            want = con.execute(sql).fetchdf()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = want[sorted(want.columns)]
            got = got[sorted(got.columns)]
            if list(want.columns) != list(got.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != "
                      f"{list(want.columns)}")
                n_fail += 1
                continue
            if len(want) != len(got):
                print(f"FAIL {name}: rows {len(got)} != {len(want)}")
                n_fail += 1
                continue
            # value compare, row order as produced (queries are totally
            # ordered); NaN-safe via string repr fallback
            eq = want.reset_index(drop=True).equals(got.reset_index(drop=True))
            if not eq:
                w = want.reset_index(drop=True)
                g = got.reset_index(drop=True)
                diff = (w.astype(str) != g.astype(str)).any(axis=1)
                if not diff.any():
                    eq = True  # dtype-only difference (e.g. int32 vs int64)
                else:
                    i = diff.idxmax()
                    print(f"FAIL {name}: first diff at row {i}\n  oracle: "
                          f"{w.iloc[i].to_dict()}\n  spark : {g.iloc[i].to_dict()}")
                    n_fail += 1
                    continue
            if eq:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(oracles)} oracle-checked ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
