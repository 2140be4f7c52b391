#!/usr/bin/env python3
"""Local pre-check of SparkEntry.oracleSql vs the Verify parquet dumps,
approximating the driver's compare: sort columns by name, sort rows,
compare values (floats rounded)."""
import sys, json, glob
import duckdb
import pyarrow.parquet as pq

vout = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

oracle = json.load(open(f"{vout}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out), [cols[i] for i in order]

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        # Type guard: the driver materializes oracle results through
        # pandas/arrow, where HUGEINT (int128, e.g. DuckDB's sum() over
        # integers) and DECIMAL convert to float64 and hash-mismatch the
        # bit-exact Spark dump. Fail loudly so every oracle casts these.
        bad = [(c, str(t)) for c, t in zip(con.sql(sql).columns, con.sql(sql).types)
               if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()]
        if bad:
            print(f"FAIL {name}: oracle output has HUGEINT/DECIMAL columns {bad}; CAST them (e.g. AS BIGINT/DOUBLE)")
            fails += 1
            continue
        res = con.execute(sql)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        files = glob.glob(f"{vout}/{name}/*.parquet")
        tbl = pq.read_table(files[0]) if len(files) == 1 else pq.read_table(f"{vout}/{name}")
        scols = tbl.column_names
        srows = [tuple(r[c] for c in scols) for r in tbl.to_pylist()]
        oc, ocn = canon(orows, ocols)
        sc, scn = canon(srows, scols)
        if ocn != scn:
            print(f"FAIL {name}: column mismatch oracle={ocn} spark={scn}")
            fails += 1
        elif oc != sc:
            print(f"FAIL {name}: {len(oc)} oracle rows vs {len(sc)} spark rows; first diff:")
            for a, b in zip(oc, sc):
                if a != b:
                    print(f"  oracle: {a}\n  spark:  {b}")
                    break
            else:
                print(f"  row-count only: {len(oc)} vs {len(sc)}")
            fails += 1
        else:
            print(f"OK   {name} ({len(sc)} rows)")
    except Exception as e:
        print(f"ERR  {name}: {e}")
        fails += 1
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
