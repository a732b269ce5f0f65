"""Driver-contract emulator: runs __spark_entry__ like the grading driver.

Round 5: type-faithful via tools.typenorm — a HUGEINT/DECIMAL oracle
column or a cross-engine type-class mismatch is a FAIL here even when
the stringified values agree, because the real driver hashes typed
values (profile_events, CORRECTNESS_r04)."""
import sys, time

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
from data_mastery_pipeline_spark.session import get_spark
from tools.typenorm import compare_results, duck_type_class, spark_type_class

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
# ONE table list — the package registry's (review r6: a hand-maintained
# copy here would silently lack any newly-registered table, turning its
# oracles into duck-errs instead of real comparisons)
from data_mastery_pipeline_spark.tables import TABLE_NAMES as TABLES

# --only q1,q2,... : restrict to a comma-separated query subset (skips
# the entry smoke) — for fast re-verification of just-touched queries.
ONLY: set[str] | None = None
_extra = [a for a in sys.argv[1:] if a.startswith("-") and a != "--only"]
if _extra or "--help" in sys.argv or "-h" in sys.argv:
    sys.exit("usage: drive_contract.py [--only q1,q2,...]   "
             "(no flags = full drive: entry smoke + every oracle)")
if "--only" in sys.argv:
    i = sys.argv.index("--only")
    if i + 1 >= len(sys.argv) or not sys.argv[i + 1].strip():
        sys.exit("usage: drive_contract.py [--only q1,q2,...]")
    ONLY = set(sys.argv[i + 1].split(","))

spark = get_spark(app_name="drive_contract", shuffle_partitions=8)

if ONLY is None:
    # 1. entry smoke
    rows = E.entry(spark).collect()
    assert len(rows) >= 0
    print(f"entry: OK ({len(rows)} rows)")

# 2. oracle compare
import duckdb

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'")

qs = E.queries()
oracles = E.oracle_sql()
if ONLY is not None:
    unknown = ONLY - set(qs)
    if unknown:
        sys.exit(f"--only names unknown queries: {sorted(unknown)}")
    qs = {k: v for k, v in qs.items() if k in ONLY}
fails, no_oracle = [], []
for name, fn in qs.items():
    t0 = time.time()
    try:
        df = fn(spark, SF_ORACLE)
        cols = df.columns
        sclasses = [spark_type_class(f.dataType) for f in df.schema.fields]
        srows = [tuple(r) for r in df.collect()]
    except Exception as ex:
        fails.append((name, f"spark-err: {ex}"))
        print(f"{name}: SPARK ERROR {str(ex)[:200]}")
        continue
    if name not in oracles:
        no_oracle.append((name, len(srows)))
        print(f"{name}: rows-only {len(srows)} ({time.time()-t0:.1f}s)")
        continue
    try:
        rel = con.sql(oracles[name])
        ocols = list(rel.columns)
        oclasses = [duck_type_class(t) for t in rel.types]
        orows = rel.fetchall()
    except Exception as ex:
        fails.append((name, f"duck-err: {ex}"))
        print(f"{name}: DUCK ERROR {str(ex)[:200]}")
        continue
    res = compare_results(cols, sclasses, srows, ocols, oclasses, orows)
    status = "OK" if res["ok"] else "FAIL"
    if not res["ok"]:
        fails.append((
            name,
            f"cols={res['cols_match']} rows={len(srows)}vs{len(orows)} "
            f"values={res['values_match']}"
            + (f" forbidden-types={res['forbidden']}" if res["forbidden"] else "")
            + (
                f" class-mismatch={res['class_mismatch']}"
                if res["class_mismatch"] else ""
            ),
        ))
    print(f"{name}: {status} ({len(srows)} rows, {time.time()-t0:.1f}s)")

print(f"\n=== {len(qs)} queries: {len(fails)} FAIL, {len(no_oracle)} rows-only ===")
for n, why in fails:
    print(f"FAIL {n}: {why}")
sys.exit(1 if fails else 0)
