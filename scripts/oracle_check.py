#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

For each query result parquet under <verifyOutDir>/<name>/, runs the
corresponding oracle SQL (oracle_sql.json) in DuckDB against views over
<sfDir>/*.parquet, then compares: row count, column names (sorted), and a
hash over the sorted row set. This is a best-effort local mirror of
CORRECTNESS_r{N}.json — kept driver-side-only (python/duckdb are not part
of the shipped library).
"""
import sys, os, json, glob, hashlib
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm_cell(v):
    # STRICT: full-precision repr, no rounding. A decimal.Decimal renders
    # scale-preserving ('1.40') vs float '1.4' — so a DECIMAL column on one
    # side and DOUBLE on the other FAILS here, mirroring the driver's
    # hasher (round-1 lesson: %.6g masked exactly these mismatches).
    if v is None: return "NULL"
    if isinstance(v, float):
        if v != v: return "NaN"
        return repr(v)
    if isinstance(v, bytes): return v.hex()
    if isinstance(v, list): return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)

def table_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return [cols[i] for i in order], len(rows), h, lines

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        qdir = f"{out_dir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sp = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            sp_cols = [d[0] for d in con.description]
            du = con.execute(oracles[name]).fetchall()
            du_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        sc, sn, sh, sl = table_sig(sp_cols, sp)
        dc, dn, dh, dl = table_sig(du_cols, du)
        if sc != dc:
            print(f"FAIL {name}: cols spark={sc} duck={dc}"); n_fail += 1
        elif sn != dn:
            print(f"FAIL {name}: rows spark={sn} duck={dn}"); n_fail += 1
        elif sh != dh:
            diff = [(a, b) for a, b in zip(sl, dl) if a != b][:3]
            print(f"FAIL {name}: hash mismatch ({sn} rows); first diffs:")
            for a, b in diff:
                print(f"    spark: {a}\n    duck : {b}")
            n_fail += 1
        else:
            print(f"PASS {name}: {sn} rows"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
