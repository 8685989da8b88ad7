#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run each oracle SQL in
DuckDB over the same parquet tables and compare with graft.Verify's
parquet dumps (column-name-sorted, row-sorted, exact value equality).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
(Driver-side tooling only — not part of the shipped library.)
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table: a directory of part files (the chaos
            # shard is built this way); driver testdata is single-file.
            p = f"{p}/*.parquet"
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # declared-vs-written diff: a query that threw writes no parquet and
    # would be invisible to the directory walk below (the r8 failure
    # mode — 28 queries silently absent). Verify dumps declared.json;
    # every declared-but-unwritten query is a hard failure here.
    declared_path = f"{out_dir}/declared.json"
    if not os.path.exists(declared_path):
        # A verify output with oracles but no declared.json means Verify
        # died before its post-loop write (or predates the guard) — the
        # exact blind spot this diff exists to close. Count it as a
        # failure, never skip silently.
        print(f"✗ declared.json MISSING in {out_dir}: cannot prove every "
              f"declared query was written (stale or aborted Verify run)")
        n_fail += 1
    else:
        declared = set(json.load(open(declared_path)))
        written = {n for n in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, n)) and not n.startswith("_")}
        for name in sorted(declared - written):
            err = ""
            fpath = f"{out_dir}/_failed/{name}.txt"
            if os.path.exists(fpath):
                err = ": " + open(fpath).read().strip()[:200]
            print(f"✗ {name}: DECLARED BUT NOT WRITTEN{err}")
            n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or name.startswith("_"):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else None
        if name not in oracles:
            rows = 0 if got is None else len(got)
            print(f"  {name}: NO-ORACLE rows={rows}")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"✗ {name}: oracle SQL failed: {e}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"✗ {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"✗ {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        bad = []
        for c in g.columns:
            a, b = g[c], e[c]
            if str(a.dtype) != str(b.dtype):
                bad.append(f"{c}: dtype {a.dtype} vs {b.dtype}")
                continue
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                i = (~eq).idxmax()
                bad.append(f"{c}: {int((~eq).sum())} diffs, first@{i}: {a[i]!r} vs {b[i]!r}")
        if bad:
            print(f"✗ {name}: " + "; ".join(bad)); n_fail += 1
        else:
            print(f"✓ {name} ({len(g)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
