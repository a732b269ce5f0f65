"""Driver-contract emulator: runs __spark_entry__ like the grading driver."""
import sys, time, hashlib

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
from data_mastery_pipeline_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = get_spark(app_name="drive_contract", shuffle_partitions=8)

# 1. entry smoke
rows = E.entry(spark).collect()
assert len(rows) >= 0
print(f"entry: OK ({len(rows)} rows)")

# 2. oracle compare
import duckdb

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'")

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if v is None:
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(f"{round(v, 6)}")
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return hashlib.sha256("\n".join(out).encode()).hexdigest()

qs = E.queries()
oracles = E.oracle_sql()
fails, no_oracle = [], []
for name, fn in qs.items():
    t0 = time.time()
    try:
        df = fn(spark, SF_ORACLE)
        cols = df.columns
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
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
    except Exception as ex:
        fails.append((name, f"duck-err: {ex}"))
        print(f"{name}: DUCK ERROR {str(ex)[:200]}")
        continue
    ok_cols = sorted(cols) == sorted(ocols)
    ok_rows = len(srows) == len(orows)
    ok_hash = ok_cols and ok_rows and norm(srows, cols) == norm(orows, ocols)
    status = "OK" if (ok_cols and ok_rows and ok_hash) else "FAIL"
    if status == "FAIL":
        fails.append((name, f"cols={ok_cols} rows={len(srows)}vs{len(orows)} hash={ok_hash}"))
    print(f"{name}: {status} ({len(srows)} rows, {time.time()-t0:.1f}s)")

print(f"\n=== {len(qs)} queries: {len(fails)} FAIL, {len(no_oracle)} rows-only ===")
for n, why in fails:
    print(f"FAIL {n}: {why}")
sys.exit(1 if fails else 0)
