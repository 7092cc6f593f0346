#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 scripts/check.py <outDir> <sfDir> [jsonOut] [only]
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first;
  `only` = comma-separated query names for subset runs — scale
  verification of just the heavy family checks those and ignores the
  rest of the manifest)

For each <outDir>/<name>/ parquet result with an oracle in
oracle_sql.json: run the SQL in DuckDB over the sfDir tables, sort
columns by name, sort rows, compare values. With jsonOut, also write
a per-query record in the driver's CORRECTNESS_r{N}.json shape, so
scale runs (e.g. sf1) leave a committable diffable artifact.
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def fresh_con(sf_dir):
    con = duckdb.connect()
    # bound the oracle's memory and give it a spill dir: the quadratic
    # dedup/near-dup oracles at sf3+ otherwise grow past RAM and get
    # OOM-killed (seen at 130 GB RSS) where out-of-core execution
    # completes fine. Both knobs are env-overridable so scale runs can
    # size them to the host (ADVICE r12): a 100GB limit on a smaller
    # box would not prevent the OS OOM-kill it exists to avoid.
    mem = os.environ.get("GRAFT_DUCKDB_MEM", "100GB")
    tmp = os.environ.get("GRAFT_DUCKDB_TMP", "/tmp/duckdb_spill")
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def within_float_tolerance(got, want, rtol=1e-12):
    """Exact equality except float columns, which admit `rtol` relative
    error (both frames already canon()-sorted). Guards the 1-ulp
    rounding-boundary class without weakening any exact column."""
    import numpy as np
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" and w.dtype.kind == "f":
            both_nan = g.isna() & w.isna()
            close = np.isclose(g.to_numpy(), w.to_numpy(), rtol=rtol,
                               atol=0.0, equal_nan=True)
            if not (close | both_nan.to_numpy()).all():
                return False
        elif not g.astype(str).equals(w.astype(str)):
            return False
    return True


def load_correctness(path):
    """THE reader for every round's CORRECTNESS_*.json (VERDICT r13
    item 8). The per-query record shape changed twice (BASELINE.md
    'Correctness-record shapes across rounds'); historical files stay
    as written, and this normalizes them all to the r13+ contract so
    round-over-round diff tooling needs no per-round special cases:
      - <=r11 rows-only marker `err == "no_oracle"` becomes
        oracle=False / err=None (it was never a failure);
      - `oracle` defaults True, `skipped` defaults None where absent.
    After normalization: non-null `err` always means failure, `skipped`
    non-null means a declared scale-class exclusion."""
    raw = json.load(open(path))
    out = {}
    for name, rec in raw.items():
        r = dict(rec)
        if r.get("err") == "no_oracle":
            r["err"] = None
            r["oracle"] = False
        r.setdefault("oracle", r.get("hash_match") is not None)
        r.setdefault("skipped", None)
        out[name] = r
    return out


def aggregate_hash_compare(con, res_dir, oracle_sql, rec, name):
    """Dump-free compare for per-row-dump queries (VERDICT r13 item 3):
    instead of materializing both result sets into pandas (the actual
    bottleneck at sf10 — 10-15M rows through astype(str), not the
    engines), both sides reduce INSIDE DuckDB to
      (row count, one order-insensitive row-coupled hash,
       one aggregate hash per column)
    and those scalars are compared. Row hash = bit_xor over
    hash(concat of all columns in sorted-name order, NULL-marked), so
    any row-level difference — including a cross-column value swap —
    changes it; per-column hashes localize a mismatch for diagnosis.
    Exact compare (no float tolerance): the tail queries this exists
    for were bit-exact at every gated scale."""
    cols = sorted(r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{res_dir}/*.parquet'").fetchall())
    ocols = sorted(r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM ({oracle_sql}) t").fetchall())
    if cols != ocols:
        rec["schema_match"] = False
        return False, f"cols {cols} vs {ocols}"
    rec["schema_match"] = True
    def cell(c):
        return f"COALESCE(CAST(\"{c}\" AS VARCHAR), chr(1))"
    row = " || chr(2) || ".join(cell(c) for c in cols)
    aggs = ", ".join(
        ["count(*) AS n", f"bit_xor(hash({row})) AS h_row"] +
        [f"bit_xor(hash({cell(c)})) AS h_{i}" for i, c in enumerate(cols)])
    got = con.execute(f"SELECT {aggs} FROM '{res_dir}/*.parquet'").fetchone()
    want = con.execute(f"SELECT {aggs} FROM ({oracle_sql}) t").fetchone()
    rec["spark_rows"], rec["oracle_rows"] = got[0], want[0]
    rec["rows_match"] = got[0] == want[0]
    if not rec["rows_match"]:
        return False, f"rows {got[0]} vs {want[0]}"
    if got != want:
        bad = [cols[i - 2] for i in range(2, len(got)) if got[i] != want[i]]
        return False, f"aggregate hash mismatch in columns {bad or ['<row coupling>']}"
    rec["hash_match"] = True
    return True, None


def main(out_dir, sf_dir, json_out=None, only=None):
    keep = set(only.split(",")) if only else None
    con = fresh_con(sf_dir)
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Declarative scale classes written by graft.Verify (ScaleClasses):
    # above the demo-corpus threshold, demo-pinned configs were excluded
    # from the Spark run (record them as declared skips, not failures)
    # and quadratic single-node oracles are downgraded to a rows-only
    # check with the reason declared in the record.
    sc_path = f"{out_dir}/scale_classes.json"
    sc = json.load(open(sc_path)) if os.path.exists(sc_path) else {}
    above = bool(sc.get("above_threshold")) and keep is None
    demo = sc.get("demo", {}) if above else {}
    quad = set(sc.get("oracle_quadratic", [])) if above else set()
    # GRAFT_HASH_ONLY: per-row-dump queries compared via in-DuckDB
    # aggregate hashes instead of a pandas materialization (scale gates
    # name wrp_parse,evt_asof_big,q19_running_sum here at sf10)
    hash_only = set(os.environ.get("GRAFT_HASH_ONLY", "").split(",")) - {""}
    record = {}
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if keep is not None and name not in keep:
            continue
        res_dir = f"{out_dir}/{name}"
        if name in demo:
            record[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": None,
                            "oracle_rows": None, "err": None, "oracle": False,
                            "skipped": f"demo-class above scale threshold: {demo[name]}"}
            print(f"SKIP {name}: demo-class above scale threshold")
            continue
        rec = {"rows_match": False, "schema_match": False, "hash_match": False,
               "spark_rows": None, "oracle_rows": None, "err": None,
               "oracle": True}
        record[name] = rec
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            rec["err"] = "no spark result"
            print(f"FAIL {name}: no spark result"); n_fail += 1; continue
        if name in quad:
            # Spark side scales and ran; the oracle replay is the
            # documented quadratic wall — rows-only above threshold.
            rec["oracle"] = False
            rec["rows_match"] = rec["schema_match"] = rec["hash_match"] = None
            rec["skipped"] = "oracle skipped: quadratic single-node replay above scale threshold"
            try:
                n = con.execute(f"SELECT count(*) FROM '{res_dir}/*.parquet'").fetchone()[0]
                rec["spark_rows"] = n
                print(f"ROWS {name} (oracle quadratic, skipped): {n}")
            except Exception as e:
                rec["err"] = str(e)[:200]
                print(f"FAIL {name} (rows-only): {e}"); n_fail += 1
            continue
        if name in hash_only:
            rec["compare"] = "aggregate_hash"
            try:
                ok, why = aggregate_hash_compare(con, res_dir, oracles[name], rec, name)
            except Exception as e:
                rec["err"] = str(e)[:200]
                print(f"FAIL {name} (aggregate-hash): {e}"); n_fail += 1
                try: con.close()
                except Exception: pass
                con = fresh_con(sf_dir)
                continue
            if ok:
                print(f"PASS {name} ({rec['spark_rows']} rows, aggregate-hash)")
                n_pass += 1
            else:
                rec["err"] = why
                print(f"FAIL {name} (aggregate-hash): {why}"); n_fail += 1
            continue
        try:
            got = canon(con.execute(f"SELECT * FROM '{res_dir}/*.parquet'").df())
            want = canon(con.execute(oracles[name]).df())
        except Exception as e:
            rec["err"] = str(e)[:200]
            print(f"FAIL {name}: {e}"); n_fail += 1
            # a failed oracle (e.g. an OOM abort) can leave the shared
            # connection's allocator poisoned so every LATER query also
            # reports OOM — reconnect to isolate failures
            try: con.close()
            except Exception: pass
            con = fresh_con(sf_dir)
            continue
        rec["spark_rows"], rec["oracle_rows"] = len(got), len(want)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
        rec["schema_match"] = True
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        rec["rows_match"] = True
        eq = got.astype(str).equals(want.astype(str))
        if not eq and within_float_tolerance(got, want):
            # 1-ulp class (VERDICT r11/r12, evt_quantiles): engines may
            # round a float's last bit differently on an exact-decimal
            # boundary. Non-float columns stay bit-exact; float columns
            # admit relative error 1e-12 — far below any semantic
            # divergence, far above ulp noise.
            eq = True
            rec["tolerance_used"] = True
        if eq:
            rec["hash_match"] = True
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            diff = (got.astype(str) != want.astype(str)).any(axis=1)
            print(f"FAIL {name}: value mismatch, first diffs:")
            print("  spark:", got[diff].head(3).to_dict("records"))
            print("  duckdb:", want[diff].head(3).to_dict("records"))
            n_fail += 1
    # queries without oracle: rows-only. Iterate the manifest (every
    # declared query), not the output dirs — a rows-only query that threw
    # inside Verify has no dir and must read as FAIL, not be skipped.
    manifest_path = f"{out_dir}/manifest.json"
    if os.path.exists(manifest_path):
        declared = json.load(open(manifest_path))
    else:
        declared = [d.rstrip("/").split("/")[-1] for d in sorted(glob.glob(f"{out_dir}/*/"))]
    for name in sorted(declared):
        if name in oracles or (keep is not None and name not in keep):
            continue
        res = f"{out_dir}/{name}"
        # rows-only: oracle=False marks the weaker check; err stays None
        # on success so consumers can treat non-null err as failure
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None,
               "oracle": False}
        record[name] = rec
        if not os.path.isdir(res):
            rec["err"] = "no spark result"
            print(f"FAIL {name} (rows-only): no spark result"); n_fail += 1; continue
        try:
            n = con.execute(f"SELECT count(*) FROM '{res}/*.parquet'").fetchone()[0]
            rec["spark_rows"] = n
            print(f"ROWS {name}: {n}")
        except Exception as e:
            rec["err"] = str(e)[:200]
            print(f"FAIL {name} (rows-only): {e}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(record, f, indent=2, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None,
                  sys.argv[4] if len(sys.argv) > 4 else None))
