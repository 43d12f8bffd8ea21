"""s-expression translator parity (reference `tests/sexpr_test.py` +
`tests/frame_test.py:95-148` golden aggregates, F4/F10 fixtures)."""

import datetime as dt

import pytest

from lakota_spark import sexpr
from lakota_spark.sexpr import SexprError


@pytest.fixture(scope="module")
def frame(spark):
    # FIXTURES.md F4
    rows = [
        (dt.datetime(2020, 5, 14, 11, 31, 41), "a", 1),
        (dt.datetime(2020, 5, 14, 11, 31, 41), "b", 2),
        (dt.datetime(2020, 5, 14, 11, 31, 42), "a", 3),
        (dt.datetime(2020, 5, 14, 11, 31, 42), "b", 4),
    ]
    return spark.createDataFrame(rows, "timestamp timestamp, category string, value long")


def test_mask(frame):
    out = sexpr.mask(frame, "(< self.value 3)")
    assert sorted(r.value for r in out.collect()) == [1, 2]


def test_mask_compound(frame):
    out = sexpr.mask(frame, "(and (>= self.value 2) (in self.category (list 'a' 'b')))")
    assert sorted(r.value for r in out.collect()) == [2, 3, 4]


def test_arithmetic(frame):
    out = sexpr.select_expr(frame, "(as (* self.value 2) 'double_v')")
    assert sorted(r.double_v for r in out.collect()) == [2, 4, 6, 8]
    out = sexpr.select_expr(frame, "(as (+ self.value 1 1) 'p')")
    assert sorted(r.p for r in out.collect()) == [3, 4, 5, 6]


def test_reduce_golden_aggregates(frame):
    # golden values from `tests/frame_test.py:109-148`
    out = sexpr.reduce_frame(
        frame,
        "self.category",
        mn="(min self.value)",
        mx="(max self.value)",
        s="(sum self.value)",
        avg="(mean self.value)",
        n="(count self.value)",
        fst="(first self.value)",
        lst="(last self.value)",
        order_cols=["timestamp", "category"],
    )
    got = {r.category: (r.mn, r.mx, r.s, r.avg, r.n, r.fst, r.lst)
           for r in out.collect()}
    assert got == {
        "a": (1, 3, 4, 2.0, 2, 1, 3),
        "b": (2, 4, 6, 3.0, 2, 2, 4),
    }


def test_reduce_floor_groupby(frame):
    # group by time bucket: `(floor self.timestamp 'D')` (`cli.py:94-97`)
    out = sexpr.reduce_frame(
        frame,
        "(as (floor self.timestamp 'D') 'day')",
        mx="(max self.value)",
        s="(sum self.value)",
        avg="(mean self.value)",
        n="(len self.value)",
    )
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.day, r.mx, r.s, r.avg, r.n) == (
        dt.datetime(2020, 5, 14), 4, 10, 2.5, 4
    )


def test_reduce_plain_quantile(frame):
    out = sexpr.reduce_frame(frame, q="(quantile self.value 0.5)")
    assert out.collect()[0].q == 2.5


def test_env_injection(frame):
    # user functions via env (`tests/sexpr_test.py:137-141` → §2.10 UDF surface)
    from pyspark.sql import functions as F

    out = sexpr.select_expr(
        frame, "(as (plus_one self.value) 'v1')",
        env={"plus_one": lambda c: c + F.lit(1)},
    )
    assert sorted(r.v1 for r in out.collect()) == [2, 3, 4, 5]


def test_numpy_style_fallbacks(frame):
    out = sexpr.select_expr(frame, "(as (char.upper self.category) 'u')")
    assert sorted(set(r.u for r in out.collect())) == ["A", "B"]
    out = sexpr.mask(frame, "(logical_not (= self.category 'a'))")
    assert all(r.category == "b" for r in out.collect())


def test_floor_over_plain_arrays():
    # reference `tests/sexpr_test.py:64-75` (test_with_frame): the time
    # builtins also evaluate driver-side over numpy arrays
    import numpy as np

    arr = np.asarray(
        ["2020-01-01T11:30", "2020-01-02T12:30", "2020-01-03T13:30"],
        dtype="datetime64[s]",
    )
    res = sexpr.evaluate(sexpr.parse("(floor ts 'Y')"), {"ts": arr})
    assert all(res == np.asarray(["2020"] * 3, dtype="datetime64[Y]"))
    res = sexpr.evaluate(sexpr.parse("(floor ts 'h')"), {"ts": arr})
    assert all(
        res
        == np.asarray(
            ["2020-01-01T11", "2020-01-02T12", "2020-01-03T13"],
            dtype="datetime64",
        )
    )
    res = sexpr.evaluate(sexpr.parse("(day_of_week_num ts)"), {"ts": arr})
    assert list(res) == [2, 3, 4]  # Wed, Thu, Fri; Monday=0
    res = sexpr.evaluate(
        sexpr.parse("(as-tz ts 'Europe/Brussels')"), {"ts": arr}
    )
    assert str(res[0]) == "2020-01-01T12:30:00"  # UTC+1 in winter
    # DST side (reference `tests/utils_test.py:96-101` semantics):
    # Brussels is UTC+2 in July
    summer = np.asarray(["2020-07-01T11:30"], dtype="datetime64[s]")
    res = sexpr.evaluate(
        sexpr.parse("(as-tz ts 'Europe/Brussels')"), {"ts": summer}
    )
    assert str(res[0]) == "2020-07-01T13:30:00"


def test_trueish_literals():
    # reference `tests/sexpr_test.py:8-30` — plain-literal expressions
    # evaluate driver-side to exactly True (no Spark involved)
    for expr in [
        "true",
        "(~ false)",
        "(= (- (+ 1 1) (+ 2 2)) -2)",
        "(= (* (/ 3 2) (/ 7 2)) 5.25)",
        "(= (/ 6 3 2) 1)",
        "(or false true false)",
        "(~ (and false true false))",
        '(in "foo" (list "ham" "foo" "bar"))',
    ]:
        assert sexpr.evaluate(sexpr.parse(expr)) is True, expr


def test_pathologic_inputs():
    # reference `tests/sexpr_test.py:113-121`
    for expr in ["(true)", "(1)", "(1", "(bar spam)"]:
        with pytest.raises(SexprError):
            sexpr.evaluate(sexpr.parse(expr))


def test_errors(frame):
    with pytest.raises(SexprError):
        sexpr.parse("(+ 1")
    with pytest.raises(SexprError):
        sexpr.mask(frame, "(frobnicate self.value)")
    with pytest.raises(SexprError):
        sexpr.mask(frame, "(= unknown_bare_token 1)")


def test_tz(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2020, 6, 1, 12, 0, 0),)], "ts timestamp"
    )
    out = sexpr.select_expr(df, "(as (as-tz self.ts 'Europe/Brussels') 'local')")
    assert out.collect()[0].local == dt.datetime(2020, 6, 1, 14, 0, 0)


def test_kw_construct():
    # reference `tests/sexpr_test.py:32-34`
    from lakota_spark.sexpr import KWargs, evaluate, parse

    res = evaluate(parse("(kw 'return_counts' true)"))
    assert isinstance(res, KWargs)
    assert res.value == {"return_counts": True}


def test_numpy_fallback_plain_values():
    # reference `tests/sexpr_test.py:42-61`: arbitrary numpy names run on
    # plain values (driver-side); Columns stay on the Spark table.
    import numpy as np

    from lakota_spark.sexpr import evaluate, parse

    res = evaluate(parse("(asarray (list 1 2 3))"))
    assert all(res == np.asarray([1, 2, 3]))

    assert evaluate(parse("(max (list 1 2 3))")) == 3

    arr = np.asarray([1, 2, 1, 2])
    res = evaluate(parse("(unique arr true)"), env={"arr": arr})
    assert all(res[0] == [1, 2]) and all(res[1] == [0, 1])

    res = evaluate(
        parse("(unique arr (kw 'return_counts' true))"), env={"arr": arr}
    )
    assert all(res[0] == [1, 2]) and all(res[1] == [2, 2])

    res = evaluate(parse("(char.lower arr)"), env={"arr": ["HAM", "Spam"]})
    assert all(res == ["ham", "spam"])


def test_numpy_fallback_rejects_columns(frame):
    # a Column argument must NOT fall into driver-side numpy: the error
    # points at the pandas_udf escape hatch instead. (sin/cos/... gained
    # Column codegen in round 9, so use a genuinely unmapped name.)
    with pytest.raises(SexprError, match="pandas_udf"):
        sexpr.mask(frame, "(> (unwrap self.value) 0)")
    # sin itself now stays JVM-side
    out = sexpr.mask(frame, "(> (sin self.value) 0)")
    assert sorted(r.value for r in out.collect()) == [1, 2, 3]


def test_env_plain_value():
    # reference `tests/sexpr_test.py:37-39`
    from lakota_spark.sexpr import evaluate, parse

    assert evaluate(parse("hello"), env={"hello": "world"}) == "world"


def test_pretty_nb(frame):
    # E11: thousands-separated 2-decimal formatting
    out = sexpr.select_expr(frame, "(as (pretty_nb (* self.value 1000)) 'p')")
    assert out.collect()[0].p in {"1,000.00", "2,000.00", "3,000.00", "4,000.00"}


def test_numpy_column_codegen_extended(frame):
    # round-9 E8 closure (VERDICT r8 #5): the common numpy surface maps
    # to Column codegen so COLUMN arguments stay JVM-side; numpy
    # semantics preserved where Spark's nearest builtin differs
    import numpy as np

    def col(expr, alias="o"):
        out = sexpr.select_expr(frame, f"(as {expr} '{alias}')")
        return [r[alias] for r in out.collect()]

    assert sorted(set(col("(char.capitalize self.category)"))) == ["A", "B"]
    assert sorted(set(col("(char.title self.category)"))) == ["A", "B"]
    assert sorted(col("(char.str_len self.category)")) == [1, 1, 1, 1]
    assert sorted(set(col("(char.replace self.category 'a' 'x')"))) == [
        "b", "x"
    ]
    assert sorted(col("(char.zfill self.category 3)"))[:2] == ["00a", "00a"]
    assert sorted(col("(clip self.value 2 3)")) == [2, 2, 3, 3]
    assert sorted(col("(power self.value 2)")) == [1.0, 4.0, 9.0, 16.0]
    assert sorted(col("(negative self.value)")) == [-4, -3, -2, -1]
    # rint is HALF-EVEN like numpy (0.5 -> 0.0 and 1.5 -> 2.0, not up)
    assert sorted(col("(rint (/ self.value 2))")) == sorted(
        np.rint(np.array([1, 2, 3, 4]) / 2).tolist()
    )
    masked = sexpr.mask(frame, "(greater self.value 2)")
    assert sorted(r.value for r in masked.collect()) == [3, 4]
    masked = sexpr.mask(frame, "(char.startswith self.category 'a')")
    assert all(r.category == "a" for r in masked.collect())
    # plain-value calls of the same names still take the numpy path
    assert sexpr.evaluate(sexpr.parse("(clip (list 1 5 9) 2 6)")).tolist() \
        == [2, 5, 6]
    # unmapped Column-side names keep the helpful error
    with pytest.raises(SexprError, match="pandas_udf"):
        sexpr.select_expr(frame, "(as (char.swapcase self.category) 'x')")


def test_numpy_semantics_mod_fmax_zfill(frame):
    # review findings (round 9): Column codegen must match the numpy
    # plain-value path on the tricky cases — mod's divisor sign, fmax's
    # NaN-ignoring, zfill's sign handling
    import numpy as np

    def col(expr, alias="o"):
        out = sexpr.select_expr(frame, f"(as {expr} '{alias}')")
        return [r[alias] for r in out.collect()]

    # mod follows the DIVISOR's sign like np.mod, not Spark %
    got = sorted(col("(mod (- 0 self.value) 3)"))
    exp = sorted(np.mod(-np.array([1, 2, 3, 4]), 3).tolist())
    assert got == exp  # [0, 1, 2, 2] — Spark % would give negatives
    assert sexpr.evaluate(sexpr.parse("(mod -7 3)")) == 2
    # fmax ignores NaN (returns the other operand); the NaN comes from a
    # COLUMN division so the whole expression stays JVM-side
    nan = "(sqrt (- 0.0 self.value))"  # sqrt of negative -> NaN, ANSI-safe
    got = col(f"(fmax {nan} (* self.value 1.0))")
    assert sorted(got) == [1.0, 2.0, 3.0, 4.0]
    got = col(f"(fmin {nan} (* self.value 1.0))")
    assert sorted(got) == [1.0, 2.0, 3.0, 4.0]
    # zfill pads AFTER a leading sign
    out = sexpr.select_expr(
        frame,
        "(as (char.zfill (concat_str '-' self.category) 4) 'z')",
        env={"concat_str": lambda a, b: __import__(
            "pyspark").sql.functions.concat(
            __import__("pyspark").sql.functions.lit(a), b)},
    )
    assert sorted(set(r.z for r in out.collect())) == ["-00a", "-00b"]


def test_numpy_column_codegen_round12(frame):
    """Round-12 E8 widening: every new mapping differentially checked
    against numpy on the same values (v = [1, 2, 3, 4])."""
    import numpy as np

    v = np.array([1, 2, 3, 4], dtype="float64")

    def col(expr, alias="o"):
        out = sexpr.select_expr(frame, f"(as {expr} '{alias}')")
        return sorted(r[alias] for r in out.collect())

    fv = "(* self.value 1.0)"
    cases = [
        (f"(arcsinh {fv})", np.arcsinh(v)),
        (f"(arccosh {fv})", np.arccosh(v)),
        (f"(arctanh (/ {fv} 5.0))", np.arctanh(v / 5.0)),
        (f"(exp2 {fv})", np.exp2(v)),
        (f"(square {fv})", np.square(v)),
        (f"(reciprocal {fv})", np.reciprocal(v)),
        (f"(positive {fv})", v),
        (f"(trunc (- 0.5 {fv}))", np.trunc(0.5 - v)),
        (f"(fix (- 0.5 {fv}))", np.fix(0.5 - v)),
        (f"(floor_divide (- 0 self.value) 3)",
         np.floor_divide(-v, 3)),
        (f"(fmod (- 0 self.value) 3)", np.fmod(-v, 3)),
        (f"(remainder (- 0 self.value) 3)", np.remainder(-v, 3)),
        (f"(copysign {fv} -2.0)", np.copysign(v, -2.0)),
        (f"(copysign {fv} 0.0)", np.copysign(v, 0.0)),
        (f"(heaviside (- self.value 2) 0.5)",
         np.heaviside(v - 2, 0.5)),
        (f"(deg2rad {fv})", np.deg2rad(v)),
        (f"(rad2deg {fv})", np.rad2deg(v)),
        ("(bitwise_and self.value 3)", np.bitwise_and(v.astype(int), 3)),
        ("(bitwise_or self.value 8)", np.bitwise_or(v.astype(int), 8)),
        ("(bitwise_xor self.value 5)", np.bitwise_xor(v.astype(int), 5)),
        ("(invert self.value)", np.invert(v.astype(int))),
        ("(left_shift self.value 2)", np.left_shift(v.astype(int), 2)),
        ("(right_shift self.value 1)", np.right_shift(v.astype(int), 1)),
        # single-arg numeric floor (two-arg stays the reference's
        # TIME floor)
        (f"(floor (/ {fv} 2.0))", np.floor(v / 2.0)),
    ]
    for expr, exp in cases:
        got = col(expr)
        assert np.allclose(got, sorted(exp.tolist()), rtol=0, atol=1e-12), (
            expr, got, sorted(exp.tolist())
        )
    # nan_to_num: NaN from a column op -> 0.0, finite values unchanged
    got = col("(nan_to_num (sqrt (- 2.0 self.value)))")
    exp = sorted(np.nan_to_num(np.sqrt(np.where(2.0 - v < 0, np.nan,
                                                2.0 - v))).tolist())
    assert np.allclose(got, exp)
    # nan_to_num also clamps +/-inf to the largest finite doubles
    # (numpy semantics — the r12 nanvl-only mapping diverged here);
    # inf made by exp overflow since ANSI mode rejects x/0.0
    with np.errstate(over="ignore"):
        got = col("(nan_to_num (exp (* self.value 500.0)))")
        exp = sorted(np.nan_to_num(np.exp(v * 500.0)).tolist())
        assert np.allclose(got, exp)
        got = col("(nan_to_num (- 0.0 (exp (* self.value 500.0))))")
        exp = sorted(np.nan_to_num(0.0 - np.exp(v * 500.0)).tolist())
        assert np.allclose(got, exp)
    # char.* predicates and count
    assert col("(char.isalpha self.category)") == [True] * 4
    assert col("(char.isdigit self.category)") == [False] * 4
    assert col("(char.count (char.add self.category self.category) 'a')")[
        -1
    ] == 2
    assert col("(char.isupper (char.upper self.category))") == [True] * 4
    assert col("(char.islower self.category)") == [True] * 4


def test_numpy_column_codegen_round13(frame):
    """Round-13 E8 widening: sinc, stable logaddexp/logaddexp2, ldexp,
    true division, isinf/isfinite — each differentially checked
    against numpy on the same values (v = [1, 2, 3, 4])."""
    import numpy as np

    v = np.array([1, 2, 3, 4], dtype="float64")

    def col(expr, alias="o"):
        out = sexpr.select_expr(frame, f"(as {expr} '{alias}')")
        return sorted(r[alias] for r in out.collect())

    fv = "(* self.value 1.0)"
    cases = [
        (f"(sinc (- {fv} 2.5))", np.sinc(v - 2.5)),
        ("(sinc (- self.value 2))", np.sinc(v - 2)),  # hits x=0
        (f"(logaddexp {fv} (- 1.0 {fv}))", np.logaddexp(v, 1.0 - v)),
        # 700-scale inputs overflow a naive log(exp+exp) — the stable
        # rearrangement must still agree with numpy
        (f"(logaddexp (* {fv} 700.0) (* {fv} 699.0))",
         np.logaddexp(v * 700.0, v * 699.0)),
        (f"(logaddexp2 {fv} (- 1.0 {fv}))", np.logaddexp2(v, 1.0 - v)),
        (f"(ldexp {fv} 3)", np.ldexp(v, 3)),
        (f"(ldexp {fv} -2)", np.ldexp(v, -2)),
        ("(divide self.value 4)", np.divide(v, 4)),
        ("(true_divide self.value 8)", np.true_divide(v, 8)),
    ]
    for expr, exp in cases:
        got = col(expr)
        assert np.allclose(
            got, sorted(exp.tolist()), rtol=1e-15, atol=1e-12
        ), (expr, got, sorted(exp.tolist()))
    # predicates: exercised through inf/nan produced by exp overflow
    # and sqrt of a negative (ANSI forbids literal x/0.0)
    inf_expr = "(exp (* self.value 500.0))"   # all overflow to +inf
    nan_expr = "(sqrt (- 2.0 (* self.value 1.0)))"  # NaN for v>2
    with np.errstate(over="ignore", invalid="ignore"):
        inf_vals = np.exp(v * 500.0)
        nan_vals = np.sqrt(np.where(2.0 - v < 0, np.nan, 2.0 - v))
    assert col(f"(isinf {inf_expr})") == sorted(
        np.isinf(inf_vals).tolist()
    )
    assert col(f"(isinf (- 0.0 {inf_expr}))") == sorted(
        np.isinf(-inf_vals).tolist()
    )
    assert col(f"(isinf {nan_expr})") == sorted(
        np.isinf(nan_vals).tolist()
    )
    assert col(f"(isfinite {nan_expr})") == sorted(
        np.isfinite(nan_vals).tolist()
    )
    assert col(f"(isfinite {inf_expr})") == sorted(
        np.isfinite(inf_vals).tolist()
    )
    assert col("(isfinite (* self.value 1.0))") == [True] * 4
    # gcd/lcm: bounded-Euclid fold — incl. sign handling, zeros,
    # variadic reduce, and the adjacent-Fibonacci worst-case depth
    iv = v.astype("int64")
    assert col("(gcd (* self.value 6) 9)") == sorted(
        np.gcd(iv * 6, 9).tolist()
    )
    assert col("(gcd (- 0 (* self.value 4)) 6)") == sorted(
        np.gcd(-iv * 4, 6).tolist()
    )
    assert col("(gcd (* self.value 0) 5)") == [5] * 4
    assert col("(gcd self.value 0)") == sorted(iv.tolist())
    assert col("(gcd (* self.value 12) 8 6)") == sorted(
        np.gcd.reduce([iv * 12, np.full(4, 8), np.full(4, 6)]).tolist()
    )
    # adjacent fibs force the deepest Euclid chain
    assert col("(gcd (+ 1134903170 (* self.value 0)) 701408733)") == [1] * 4
    assert col("(lcm (* self.value 4) 6)") == sorted(
        np.lcm(iv * 4, 6).tolist()
    )
    assert col("(lcm (* self.value 0) 7)") == [0] * 4
    assert col("(lcm (- 0 self.value) 3)") == sorted(
        np.lcm(-iv, 3).tolist()
    )
