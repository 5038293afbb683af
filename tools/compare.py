#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, load the engine's parquet output,
sort columns by name + rows by all columns, and compare values exactly."""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np
import pyarrow.dataset as pads


def driver_fidelity_gate(outp):
    """Fail exactly the way the driver fails: the driver reads each output
    directory with pyarrow.dataset(dir), which ingests EVERY non-hidden
    member file and errors on anything that is not parquet (this is what
    zeroed 61/70 rows in CORRECTNESS_r02 when an oracle.sql copy was
    dropped into each dir). Also assert only part-*/_SUCCESS members."""
    for m in os.listdir(outp):
        if m.startswith('.') or m == '_SUCCESS':
            continue
        if not (m.startswith('part-') and m.endswith('.parquet')):
            raise RuntimeError(f"foreign file in output dir: {m}")
    pads.dataset(outp)  # raises if any ingested member is not parquet

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None

con = duckdb.connect()
for f in glob.glob(os.path.join(sfdir, '*.parquet')):
    name = os.path.basename(f)[:-len('.parquet')]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(os.path.join(outdir, 'oracle_sql.json')))
# Verify emits each oracle under both "<name>" and "<name>.parquet" (the
# driver keys by output-dir name); this replica uses the bare names.
oracle = {k: v for k, v in oracle.items() if not k.endswith('.parquet')}

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints -> int64, floats stay float64, rest -> str
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype('int64')
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype('float64')
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype('datetime64[us]')
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    outp = os.path.join(outdir, name + '.parquet')
    if not os.path.isdir(outp):
        print(f"FAIL {name}: no engine output dir"); fails += 1; continue
    try:
        driver_fidelity_gate(outp)
        got = canon(con.execute(
            f"SELECT * FROM read_parquet('{outp}/*.parquet')").df())
        want = canon(con.execute(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: exec error: {e}"); fails += 1; continue
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fails += 1; continue
    eq = True
    for c in got.columns:
        a, b = got[c].values, want[c].values
        if np.issubdtype(a.dtype, np.floating):
            same = np.array_equal(a, b, equal_nan=True)
        else:
            same = np.array_equal(a, b)
        if not same:
            idx = None
            try:
                if np.issubdtype(a.dtype, np.floating):
                    neq = ~((a == b) | (np.isnan(a) & np.isnan(b)))
                else:
                    neq = a != b
                idx = int(np.argmax(neq))
            except Exception:
                pass
            print(f"FAIL {name}: col {c} differs (e.g. row {idx}: {a[idx]!r} vs {b[idx]!r})")
            eq = False
            break
    if eq:
        print(f"OK   {name}: {len(got)} rows")
    else:
        fails += 1

# queries without oracle: rows-only check
for entry in sorted(os.listdir(outdir)):
    if not entry.endswith('.parquet'):
        continue
    name = entry[:-len('.parquet')]
    p = os.path.join(outdir, entry)
    if os.path.isdir(p) and name not in oracle and (not only or name in only):
        try:
            driver_fidelity_gate(p)
            n = con.execute(f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
            print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            if n == 0: fails += 1
        except Exception as e:
            print(f"FAIL {name}: {e}"); fails += 1

print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
