#!/usr/bin/env python3
"""selfcheck.py with a per-oracle wall-clock budget, for the sf1
throughput tier: several ORACLES are deliberately quadratic (all-pairs
list_intersect joins, recursive-CTE transitive closures) where the
engine under test is not — at sf1 those DuckDB replays can run for
hours. Each oracle runs in a forked child killed after TIMEOUT_SEC
(default 180); a kill records ORACLE_TIMEOUT, which is a statement
about the oracle's cost, not the engine's correctness (those queries
remain oracle-verified at sf0.001/sf0.01/sf0.1).

Usage: python3 scripts/selfcheck_timeout.py [sfDir] [outDir] [timeoutSec]
"""
import sys, json, glob, os
import multiprocessing as mp


def check_one(sf, out, name, sql, q):
    import duckdb
    import pyarrow.parquet as pq
    con = duckdb.connect()
    for p in glob.glob(f"{sf}/*.parquet"):
        t = p.split("/")[-1].replace(".parquet", "")
        # GenScale tiers are Spark-written DIRECTORIES; driver testdata
        # is single files — glob the dir form
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    try:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            q.put(("FAIL", "no spark output")); return
        spark_df = pq.read_table(files).to_pandas()
        duck_df = con.execute(sql).fetchdf()
        sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
        if sc != dc:
            q.put(("FAIL", f"cols spark={sc} duck={dc}")); return
        a = spark_df[sc].sort_values(sc, kind="mergesort").reset_index(drop=True)
        b = duck_df[sc].sort_values(sc, kind="mergesort").reset_index(drop=True)
        if len(a) != len(b):
            q.put(("FAIL", f"rows spark={len(a)} duck={len(b)}")); return
        for c in sc:
            av, bv = a[c], b[c]
            ak, bk = av.dtype.kind, bv.dtype.kind
            if ak != bk and ak in "iuf" and bk in "iuf":
                q.put(("FAIL", f"col={c} dtype {av.dtype} vs {bv.dtype}")); return
            if ak == "f" or bk == "f":
                av_, bv_ = av.astype(float), bv.astype(float)
                neq = ~((av_ == bv_) | (av_.isna() & bv_.isna()))
                if neq.any():
                    i = neq.idxmax()
                    q.put(("FAIL", f"col={c} {av_[i]!r} vs {bv_[i]!r}")); return
            else:
                neq = av.astype(str) != bv.astype(str)
                if neq.any():
                    i = neq.idxmax()
                    q.put(("FAIL", f"col={c} {av[i]!r} vs {bv[i]!r}")); return
        q.put(("PASS", f"{len(a)} rows"))
    except Exception as e:
        q.put(("FAIL", f"{type(e).__name__}: {str(e)[:200]}"))


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 180
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    passed, fails, timeouts = [], [], []
    for name, sql in sorted(oracle.items()):
        q = mp.Queue()
        p = mp.Process(target=check_one, args=(sf, out, name, sql, q))
        p.start()
        p.join(budget)
        if p.is_alive():
            p.terminate(); p.join()
            print(f"ORACLE_TIMEOUT {name} (> {budget}s in DuckDB)", flush=True)
            timeouts.append(name)
        else:
            status, msg = q.get() if not q.empty() else ("FAIL", "child died")
            print(f"{status} {name}: {msg}" if status == "FAIL"
                  else f"PASS {name} ({msg})", flush=True)
            (passed if status == "PASS" else fails).append(name)
    print(f"\n{len(passed)} PASS / {len(fails)} FAIL / "
          f"{len(timeouts)} ORACLE_TIMEOUT of {len(oracle)}")
    if timeouts:
        print("timeouts:", " ".join(timeouts))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
