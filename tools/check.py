#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: load each Verify output
parquet, run the oracle SQL in DuckDB over the same testdata tables, and
compare as sorted multisets (columns sorted by name, rows sorted).

Driver-strict mode (round 8): after the numeric compare, cells are ALSO
compared as strings. The driver hashes stringified values, so differences
invisible to numeric equality are real failures there: IEEE -0.0 vs 0.0
(DuckDB round() keeps the sign on tiny negatives), and int64 vs float64
(DuckDB sum(BIGINT) -> HUGEINT -> pandas float64). And the driver sorts
EVERY result frame, including rows-only ones, so an array-typed output
column crashes its checker (unhashable numpy.ndarray) -- we sort no-oracle
frames too, to surface that locally."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok, bad, skipped = [], [], []
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
    if name not in oracle:
        # the driver sorts rows-only frames before hashing: replicate, so
        # checker-hostile column types (arrays) fail HERE, not at the gate
        try:
            g = got.reindex(sorted(got.columns), axis=1)
            g.sort_values(by=list(g.columns)).reset_index(drop=True)
            skipped.append((name, len(got)))
        except Exception as e:
            bad.append((name, f"rows-only frame not driver-sortable: {e}"))
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        bad.append((name, f"oracle SQL failed: {e}"))
        continue
    g = got.reindex(sorted(got.columns), axis=1)
    e = exp.reindex(sorted(exp.columns), axis=1)
    if list(g.columns) != list(e.columns):
        bad.append((name, f"columns: got {list(g.columns)} want {list(e.columns)}"))
        continue
    g = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    e = e.sort_values(by=list(e.columns)).reset_index(drop=True)
    if len(g) != len(e):
        bad.append((name, f"rows: got {len(g)} want {len(e)}"))
        continue
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
    except AssertionError as ex:
        msg = str(ex).split("\n")[0:3]
        diff = (g.values != e.values).sum()
        bad.append((name, f"{diff} mismatched cells; {' / '.join(msg)}"))
        continue
    # driver-strict: stringified cells must match too (catches -0.0 vs 0.0,
    # int64 vs float64 -- numerically equal, hash-distinct at the driver)
    gs, es = g.astype(str), e.astype(str)
    if not gs.equals(es):
        ncell = (gs.values != es.values).sum()
        cols = [c for c in gs.columns if not gs[c].equals(es[c])]
        samp = ""
        for c in cols[:2]:
            m = gs[c] != es[c]
            i = m.idxmax()
            samp += f" [{c}@{i}: spark={gs[c][i]!r} oracle={es[c][i]!r}]"
        bad.append((name, f"STRICT: {ncell} cells stringify differently in {cols}{samp}"))
        continue
    ok.append(name)

print(f"PASS {len(ok)}: {' '.join(ok)}")
for name, n in skipped:
    print(f"SKIP (no oracle) {name}: {n} rows")
for name, msg in bad:
    print(f"FAIL {name}: {msg}")
sys.exit(1 if bad else 0)
