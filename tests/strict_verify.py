"""Strict local replication of the external correctness gate:
run the verify-window queries (the first 50 registry entries) on
Spark AND DuckDB at sf0.01 and compare EXACT cell values — doubles
by IEEE bit pattern, not rounded (`test_oracle_equivalence` rounds
floats to 6dp, which is exactly the tolerance that let the r05 hash
fails through locally). Run before every round close:

    python -m tests.strict_verify [N]

N defaults to 50 (the window); pass 0 for the whole registry.
Exits nonzero listing any query whose schema/rows/values differ.
"""

from __future__ import annotations

import math
import struct
import sys

import duckdb

from flink_ecommerce_spark.typed_check import typed_mismatches

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return struct.pack("<d", v).hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def main() -> int:
    from flink_ecommerce_spark import registry
    from flink_ecommerce_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    names = list(registry.SPECS)
    if n:
        names = names[:n]
    spark = get_spark("strict_verify")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    fails: list[tuple[str, str]] = []
    for name in names:
        spec = registry.SPECS[name]
        try:
            sdf = spec.fn(spark, SF)
            scols, srows = sdf.columns, sdf.collect()
            # Typed gate (VERDICT r06 #2): fetch the oracle via Arrow
            # and compare canonical column types against the Spark
            # schema — catches DuckDB HUGEINT/DECIMAL drift that
            # fetchall() collapses to indistinguishable Python ints.
            otbl = con.execute(spec.oracle).arrow()
            tmis = typed_mismatches(sdf.schema, otbl.schema)
            if tmis:
                fails.append((name, f"typed {tmis}"))
                continue
            res = con.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            if sorted(scols) != sorted(ocols):
                fails.append((name, f"schema {scols} vs {ocols}"))
                continue
            if len(srows) != len(orows):
                fails.append((name, f"rows {len(srows)} vs {len(orows)}"))
                continue
            i_s = sorted(range(len(scols)), key=lambda i: scols[i])
            i_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
            key = lambda t: tuple((v is None, str(v)) for v in t)  # noqa: E731
            ms = sorted(
                [tuple(_norm(r[i]) for i in i_s) for r in srows], key=key
            )
            mo = sorted(
                [tuple(_norm(r[i]) for i in i_o) for r in orows], key=key
            )
            if ms != mo:
                bad = sum(1 for a, b in zip(ms, mo) if a != b)
                fails.append((name, f"{bad}/{len(ms)} rows differ bit-exact"))
            else:
                print(f"{name}: ok ({len(srows)} rows)")
        except Exception as e:  # pragma: no cover - diagnostic path
            fails.append((name, f"ERROR {e}"))
    spark.stop()
    if fails:
        print(f"\nSTRICT FAILS ({len(fails)}):")
        for name, why in fails:
            print(f"  {name}: {why}")
        return 1
    print(f"\nall {len(names)} queries bit-exact at {SF}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
