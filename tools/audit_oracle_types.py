#!/usr/bin/env python3
"""Oracle TYPE audit (driver-side tooling only).

The r18 round's single correctness failure was a cross-engine type
leak: DuckDB's sum(BIGINT) widens to HUGEINT, so an un-cast
aggregate-derived projection column reaches the driver's hasher as
INT128 while Spark emits BIGINT — identical values, different hash.
The local checker's float coercion masks it (tools/check_oracle.py
compares values, not wire types).

This audit runs every oracle_sql.json statement against the sf views
and flags any RESULT column whose DuckDB type is one Spark never
emits through our catalog contract: HUGEINT / UHUGEINT, and DECIMAL
(the catalog's determinism contract mandates BIGINT/DOUBLE/VARCHAR/
BOOLEAN/DATE/TIMESTAMP/INTEGER projections). Zero flags = the trap
class is closed catalog-wide.

Usage: audit_oracle_types.py <oracle_sql.json> <sf_dir>
"""
import sys, json, glob, os
import duckdb

BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main(oracle_json: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracles = json.load(open(oracle_json))
    n_flag = 0
    for name in sorted(oracles):
        try:
            rel = con.sql(oracles[name])
            types = [str(t).upper() for t in rel.types]
            bad = [
                (c, t)
                for c, t in zip(rel.columns, types)
                if any(b in t for b in BAD)
            ]
            if bad:
                n_flag += 1
                print(f"FLAG {name}: " + ", ".join(f"{c}::{t}" for c, t in bad))
        except Exception as e:
            n_flag += 1
            print(f"ERROR {name}: {e}")
    print(f"\n{len(oracles)} oracles audited; "
          f"{'ALL CLEAN' if n_flag == 0 else f'{n_flag} FLAGGED'}")
    return 1 if n_flag else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
