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
    print("== all pass ==" if ok else "== FAILURES ==")
    return 0 if ok else 1


if __name__ == "__main__":
    import sys
    sys.exit(main())
