"""Hypothesis differential for the two driver-local write paths: for
every dict-of-numpy input the arrow fast path accepts, the segment it
writes must be BYTE-IDENTICAL (same content address) to the pandas
path's, with the same zone map and bounds — content addressing backs
dedup and the double-write no-op, so any divergence silently doubles
storage or breaks idempotence. Covers dtype width variation
(int32/uint32/int64, float32/float64, M8[s/ms/us/ns]), NaN (stored as
parquet NULL on both paths), unsorted input (stable lexsort vs stable
sort_values), and duplicate index values."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakota_spark.repo import Repo
from lakota_spark.schema import Schema

_int_dtypes = st.sampled_from(["int32", "int64", "uint32"])
_float_dtypes = st.sampled_from(["float32", "float64"])
_ts_units = st.sampled_from(["s", "ms", "us", "ns"])


@st.composite
def _frames(draw):
    n = draw(st.integers(1, 9))
    kd = draw(_int_dtypes)
    lo = 0 if kd.startswith("u") else -1000
    k = np.array(
        draw(st.lists(st.integers(lo, 1000), min_size=n, max_size=n)),
        dtype=kd,
    )
    vals = draw(
        st.lists(
            st.one_of(
                st.floats(-1e6, 1e6, allow_nan=False, width=32),
                st.just(float("nan")),
            ),
            min_size=n,
            max_size=n,
        )
    )
    v = np.array(vals, dtype=draw(_float_dtypes))
    unit = draw(_ts_units)
    secs = draw(
        st.lists(
            st.integers(0, 2**31 - 1), min_size=n, max_size=n
        )
    )
    t = np.array(secs, dtype="i8").view(f"M8[s]").astype(f"M8[{unit}]")
    if draw(st.booleans()):
        # strided views (arr[::2]) must not break the zero-copy path
        k = np.repeat(k, 2)[::2]
        t = np.repeat(t, 2)[::2]
        v = np.repeat(v, 2)[::2]
    return {"k": k, "t": t, "v": v}


@pytest.fixture(scope="module")
def wrepo(tmp_path_factory):
    return Repo(str(tmp_path_factory.mktemp("wprop")))


_N = [0]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_frames())
def test_fast_and_pandas_paths_byte_identical(wrepo, data):
    _N[0] += 1
    i = _N[0]
    schema = Schema(k="int*", t="timestamp", v="float")
    ca = wrepo.create_collection(schema, f"pa_{i}")
    cb = wrepo.create_collection(schema, f"pb_{i}")
    sa, sb = ca.series("x"), cb.series("x")
    sa.write(data)
    sb.write(pd.DataFrame(data))
    ga = sorted(wrepo.fs.ls(f"pa_{i}/segments"))
    gb = sorted(wrepo.fs.ls(f"pb_{i}/segments"))
    assert ga == gb, (data, ga, gb)
    assert (
        sa.segments()[0].meta.get("zmap")
        == sb.segments()[0].meta.get("zmap")
    )
    assert sa.segments()[0].start == sb.segments()[0].start
    assert sa.segments()[0].stop == sb.segments()[0].stop
    assert sa.df().equals(sb.df())
