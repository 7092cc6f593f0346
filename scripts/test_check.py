#!/usr/bin/env python3
"""Self-test for check.py's compare semantics (run: python3 scripts/test_check.py).

Covers the numeric-tolerance fallback (the 1-ulp rounding-boundary
class, VERDICT r11/r12) and its limits: float columns admit 1e-12
relative error, everything else stays bit-exact.
"""
import pandas as pd
import check


def t(name, cond):
    print(("PASS " if cond else "FAIL ") + name)
    return cond


def main():
    ok = True
    a = pd.DataFrame({"k": ["x", "y"], "v": [1.0, 2.0]})
    # 1-ulp-ish wiggle: inside tolerance
    b = a.copy(); b["v"] = [1.0 + 1e-15, 2.0]
    ok &= t("ulp wiggle passes", check.within_float_tolerance(a, b))
    # real divergence: outside tolerance
    c = a.copy(); c["v"] = [1.001, 2.0]
    ok &= t("real float divergence fails", not check.within_float_tolerance(a, c))
    # non-float columns stay exact
    d = a.copy(); d["k"] = ["x", "z"]
    ok &= t("string divergence fails", not check.within_float_tolerance(a, d))
    # NaN == NaN (both engines emit NULL)
    e = pd.DataFrame({"k": ["x"], "v": [float("nan")]})
    f = pd.DataFrame({"k": ["x"], "v": [float("nan")]})
    ok &= t("NaN aligns with NaN", check.within_float_tolerance(e, f))
    # integer columns are not loosened
    g = pd.DataFrame({"n": [10]})
    h = pd.DataFrame({"n": [11]})
    ok &= t("int divergence fails", not check.within_float_tolerance(g, h))

    # aggregate-hash compare (dump-free mode): equal results pass,
    # value / row-count / schema / cross-column-swap divergences fail
    import duckdb, tempfile, os
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as td:
        res = os.path.join(td, "q"); os.makedirs(res)
        con.execute(f"COPY (SELECT i AS a, CAST(i * 2 AS VARCHAR) AS b "
                    f"FROM range(1000) t(i)) TO '{res}/part.parquet'")
        def ah(sql):
            rec = {}
            return check.aggregate_hash_compare(con, res, sql, rec, "q"), rec
        (okc, why), rec = ah("SELECT i AS a, CAST(i*2 AS VARCHAR) AS b FROM range(1000) t(i)")
        ok &= t("aggregate-hash equal passes", okc and rec["hash_match"])
        (okc, why), _ = ah("SELECT i AS a, CAST(i*2 AS VARCHAR) AS b FROM range(999) t(i)")
        ok &= t("aggregate-hash row-count diff fails", not okc and "rows" in why)
        (okc, why), _ = ah("SELECT i AS a, CAST(i*3 AS VARCHAR) AS b FROM range(1000) t(i)")
        ok &= t("aggregate-hash value diff fails", not okc)
        (okc, why), _ = ah("SELECT i AS a, CAST(i*2 AS VARCHAR) AS c FROM range(1000) t(i)")
        ok &= t("aggregate-hash schema diff fails", not okc and "cols" in why)
        # row-order insensitivity (both sides sort-free)
        (okc, why), _ = ah("SELECT i AS a, CAST(i*2 AS VARCHAR) AS b "
                           "FROM range(1000) t(i) ORDER BY i DESC")
        ok &= t("aggregate-hash order-insensitive", okc)
        # cross-column swap with identical per-column multisets must
        # fail via the row-coupled hash
        con.execute(f"COPY (SELECT CAST(x AS BIGINT) AS a, CAST(y AS BIGINT) AS b "
                    f"FROM (VALUES (1, 2), (3, 4)) v(x, y)) "
                    f"TO '{res}/part.parquet' (OVERWRITE_OR_IGNORE)")
        (okc, why), _ = ah("SELECT CAST(x AS BIGINT) AS a, CAST(y AS BIGINT) AS b "
                           "FROM (VALUES (1, 4), (3, 2)) v(x, y)")
        ok &= t("aggregate-hash catches cross-column swap", not okc)

    # one reader path for all historical record shapes
    import json
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as fh:
        json.dump({
            "old_rows_only": {"rows_match": None, "hash_match": None,
                              "err": "no_oracle"},
            "old_pass": {"rows_match": True, "schema_match": True,
                         "hash_match": True, "err": None},
            "new_skip": {"rows_match": None, "hash_match": None, "err": None,
                         "oracle": False, "skipped": "demo-class"},
        }, fh)
        p = fh.name
    recs = check.load_correctness(p); os.unlink(p)
    ok &= t("no_oracle normalizes to rows-only, not failure",
            recs["old_rows_only"]["err"] is None
            and recs["old_rows_only"]["oracle"] is False)
    ok &= t("old pass keeps oracle=True", recs["old_pass"]["oracle"] is True)
    ok &= t("declared skip survives", recs["new_skip"]["skipped"] == "demo-class")

    print("== all pass ==" if ok else "== FAILURES ==")
    return 0 if ok else 1


if __name__ == "__main__":
    import sys
    sys.exit(main())
