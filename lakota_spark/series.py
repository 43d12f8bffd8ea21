"""Series: one labeled, sorted time-series inside a collection.

Write path (`lakota/series.py:82-157` semantics, Spark-native execution):
cast to schema → range-partition + sort → write a content-addressed
Parquet segment → overlay onto the leaf snapshot → append a revision.

Read path (`lakota/series.py:314-338`): resolve snapshot → prune segments
by label + interval (pure metadata, before Spark sees any file) → ONE
parquet scan of the surviving files → broadcast-join the tiny per-segment
bounds table keyed on the segment directory name → apply effective-bound
and query-range filters (both plain Catalyst predicates: pushdown, column
pruning and row-group skipping all engage) → optional select/limit/offset.

Scale notes: the only driver-side work is metadata (segment lists); data
never flows through the driver. A snapshot with S segments costs one
broadcast of S rows — with defrag keeping segments at ~page_len rows,
100 TB ≈ a few hundred thousand segments ≈ a few tens of MB of bounds,
still broadcastable; the pruning pass cuts that to the queried interval.
"""

from __future__ import annotations

import datetime as dt
import uuid

import pyarrow as pa_lib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakota_spark.commit import Segment
from lakota_spark.fsio import FS

PAGE_LEN = 500_000  # target rows per segment (`lakota/utils.py:38`)

CLOSED = {
    "b": (True, True),
    "l": (True, False),
    "r": (False, True),
    "n": (False, False),
    # reference spelling (`lakota/utils.py` Closed enum / CLI --closed)
    "BOTH": (True, True),
    "LEFT": (True, False),
    "RIGHT": (False, True),
    "NONE": (False, False),
}


def _pa_bound_mask(tbl, idx, bound, closed, is_start):
    """Lexicographic prefix-bound mask over an arrow table — the exact
    twin of `Series._pandas_bound_mask` in pyarrow.compute. Shared by
    the ordered mapInArrow reader and the `lakota` data source."""
    import pyarrow.compute as pc

    strict = None
    eq_all = None
    for c, v in zip(idx[: len(bound)], bound):
        col = tbl.column(c)
        cmp = pc.greater(col, v) if is_start else pc.less(col, v)
        eq = pc.equal(col, v)
        if strict is None:
            strict, eq_all = cmp, eq
        else:
            strict = pc.or_(strict, pc.and_(eq_all, cmp))
            eq_all = pc.and_(eq_all, eq)
    return pc.or_(strict, eq_all) if closed else strict


def _arrow_mask_expr(plan):
    """Rebuild a `sexpr.to_filter_plan` plan as a pyarrow.compute
    Expression — executor-side inside `_ordered_reader` (so a user mask
    participates in row-group pruning AND exact filtering on the sorted
    scan), and driver-side by `frame()` to VALIDATE the plan against an
    empty cast table before trusting the fast path with it."""
    import pyarrow.compute as pc

    kind = plan[0]
    if kind == "lit":
        return plan[1]
    if kind == "field":
        return pc.field(plan[1])
    if kind == "cmp":
        _, op, a, b = plan
        a, b = _arrow_mask_expr(a), _arrow_mask_expr(b)
        if op == "<":
            return a < b
        if op == "<=":
            return a <= b
        if op == "=":
            return a == b
        if op == "!=":
            return a != b
        if op == ">=":
            return a >= b
        return a > b
    if kind in ("and", "or"):
        out = None
        for item in plan[1]:
            e = _arrow_mask_expr(item)
            out = e if out is None else (out & e if kind == "and" else out | e)
        return out
    if kind == "not":
        return ~_arrow_mask_expr(plan[1])
    if kind == "in":
        return _arrow_mask_expr(plan[1]).isin(plan[2])
    if kind == "isnull":
        return _arrow_mask_expr(plan[1]).is_null()
    raise ValueError(f"unknown mask plan node {plan!r}")


def _nan_safe_stat_columns(table) -> list[str] | bool:
    """Columns safe to carry parquet min/max statistics: pyarrow SKIPS
    NaN when computing float stats, and Spark's row-group pruning
    trusts those stats — so a pushed ``f > 10`` filter silently drops
    the NaN rows Spark's own NaN-greatest semantics would keep
    (reproduced; Spark's writer omits stats in this case).  Returns
    True (all) when no float column holds NaN, else the keep-list."""
    import pyarrow as pa
    import pyarrow.compute as pc

    drop = set()
    for name, col in zip(table.column_names, table.columns):
        if pa.types.is_floating(col.type) and pc.any(
            pc.is_nan(col)
        ).as_py():
            drop.add(name)
    if not drop:
        return True
    return [c for c in table.column_names if c not in drop]


def _physical_plan_str(df) -> str:
    """Physical plan text for heuristics (e.g. "does this input carry
    an Exchange?"). Classic sessions read it off the py4j
    queryExecution handle (no extra round trip); Spark Connect has no
    `_jdf`, so fall back to capturing `df.explain()` — one extra
    AnalyzePlan RPC, same physical-plan text (NOTES.md "Spark Connect
    compatibility matrix")."""
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    except Exception:  # noqa: BLE001 — Connect session
        import contextlib
        import io as _io

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        return buf.getvalue()


def _ordered_reader(
    root_uri: str,
    read_struct,
    out_cols: list[str],
    filters: list[tuple],
    bounds,
    mask_plan=None,
):
    """Executor-side reader for `Series._ordered_scan`: each partition
    reads its (interval-contiguous, name-sorted) part files with pyarrow
    IN ORDER and yields record batches cast to Spark's expected arrow
    schema — preserving the global sort without any Exchange.

    ``read_struct`` is the Spark StructType of the read projection
    (out_cols plus any index columns a bound mask needs); ``bounds`` is
    ``(idx_cols, start_b, start_closed, stop_b, stop_closed)`` or None.
    The exact lexicographic prefix mask mirrors
    `Series._pandas_bound_mask` in pyarrow.compute, applied AFTER the
    cast to Spark's arrow types so timestamp comparisons see ONE
    timezone convention (Spark-written segments read tz=UTC, legacy
    INT96 reads naive — the cast unifies both; naive datetime bounds
    are UTC-localized to match, the session timezone being UTC). The
    coarse leading-index filters keep row-group pruning; a file whose
    physical type refuses the comparison (naive legacy timestamps)
    retries unfiltered — the exact mask still clips it."""
    import datetime as _dt

    from pyspark.sql.pandas.types import to_arrow_schema

    read_cols = [f.name for f in read_struct.fields]
    target = to_arrow_schema(read_struct)

    def utcize(v):
        if isinstance(v, _dt.datetime) and v.tzinfo is None:
            return v.replace(tzinfo=_dt.timezone.utc)
        return v

    filters = [(c, op, utcize(v)) for c, op, v in filters]
    if bounds is not None:
        idx_b, start_b, s_cl, stop_b, e_cl = bounds
        bounds = (
            idx_b,
            tuple(map(utcize, start_b)) if start_b is not None else None,
            s_cl,
            tuple(map(utcize, stop_b)) if stop_b is not None else None,
            e_cl,
        )

    bound_mask = _pa_bound_mask

    def read(batches):
        import posixpath

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyarrow import fs as pafs

        fsys, root = pafs.FileSystem.from_uri(root_uri)
        rels = [
            rel
            for batch in batches
            for rel in batch.column("rel").to_pylist()
        ]
        if not rels:
            return

        mask_expr = (
            _arrow_mask_expr(mask_plan) if mask_plan is not None else None
        )

        def finish(tbl):
            tbl = tbl.select(read_cols).cast(target)
            if bounds is not None:
                idx, start_b, s_closed, stop_b, e_closed = bounds
                if start_b is not None:
                    tbl = tbl.filter(
                        bound_mask(tbl, idx, start_b, s_closed, True)
                    )
                if stop_b is not None:
                    tbl = tbl.filter(
                        bound_mask(tbl, idx, stop_b, e_closed, False)
                    )
            if mask_expr is not None:
                # exact mask post-cast — authoritative even when the
                # read-time pushdown below had to retry unfiltered
                tbl = tbl.filter(mask_expr)
            return tbl

        if len(rels) > 8:
            # fragmented partition: ONE C++ dataset scan instead of
            # per-file pq.read_table calls (GIL-bound python overhead
            # dominates many small files — the `_read_run_local`
            # lesson). Scanner.to_table materializes in fragment
            # (= given-path) order, preserving the partition's sort.
            import pyarrow.dataset as pads

            expr = None
            for c, op, v in filters:
                f = pads.field(c)
                if op == ">=":
                    e = f >= v
                elif op == ">":
                    e = f > v
                elif op == "<=":
                    e = f <= v
                else:
                    e = f < v
                expr = e if expr is None else expr & e
            if mask_expr is not None:
                expr = mask_expr if expr is None else expr & mask_expr
            ds = pads.dataset(
                [posixpath.join(root, rel) for rel in rels],
                format="parquet",
                filesystem=fsys,
            )
            try:
                tbl = ds.to_table(columns=read_cols, filter=expr)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                if expr is None:
                    raise
                tbl = ds.to_table(columns=read_cols)
            tbl = finish(tbl)
            if tbl.num_rows:
                yield from tbl.select(out_cols).to_batches()
            return
        read_filters = filters or None
        if mask_expr is not None:
            # read_table takes ONE filters value — fold the coarse
            # tuples into the mask expression so both still prune
            import pyarrow.dataset as pads

            read_filters = mask_expr
            for c, op, v in filters:
                f = pads.field(c)
                e = (
                    f >= v if op == ">=" else f > v if op == ">"
                    else f <= v if op == "<=" else f < v
                )
                read_filters = read_filters & e
        for rel in rels:
            full = posixpath.join(root, rel)
            try:
                tbl = pq.read_table(
                    full,
                    filesystem=fsys,
                    columns=read_cols,
                    filters=read_filters,
                )
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                if read_filters is None:
                    raise
                tbl = pq.read_table(
                    full, filesystem=fsys, columns=read_cols
                )
            tbl = finish(tbl)
            if tbl.num_rows:
                yield from tbl.select(out_cols).to_batches()

    return read


class Series:
    #: class-level ring of recent driver-local read fallbacks (reason
    #: strings) — lets tests and operators detect a silent demotion of
    #: `df()` to the Spark path (see `df()` docstring)
    df_fallbacks: list[str] = []

    def __init__(self, collection, label: str):
        self.collection = collection
        self.label = label
        self.schema = collection.schema

    @property
    def spark(self):
        return self.collection.spark

    # ------------------------------------------------------------------ io

    def _idx_struct(self):
        return F.struct(*[F.col(c) for c in self.schema.idx])

    def _coerce_df(self, data) -> DataFrame:
        df, _ = self._coerce_df_local(data)
        return df

    def _coerce_df_local(self, data):
        """Coerce to a cast DataFrame; second return is the driver-local
        pandas frame when the input was local (dict/pandas), else None —
        lets the write path compute count/bounds without a Spark job."""
        if isinstance(data, DataFrame):
            return self.schema.cast(data), None
        # dict-of-lists / list-of-rows / pandas convenience (tests, CLI)
        import pandas as pd

        if isinstance(data, dict):
            data = pd.DataFrame(data)
        if isinstance(data, pd.DataFrame) and len(data) == 0:
            return self.spark.createDataFrame([], self.schema.struct_type()), data
        # infer first, then cast: inputs may hold ISO strings for timestamps
        # etc. — the declared schema coerces (`lakota/schema.py:130-133`)
        df = self.spark.createDataFrame(data)
        pdf = data if isinstance(data, pd.DataFrame) else None
        return self.schema.cast(df), pdf

    def _local_stats(self, pdf):
        """(n, lo, hi) computed driver-side from a local pandas frame —
        None when any index column's dtype would need the engine's cast
        to compare correctly (e.g. ISO strings for a timestamp index).
        Values are normalized to the same Python types Spark's Row
        returns, so segment bounds are byte-identical either path."""
        import pandas as pd

        idx = list(self.schema.idx)
        if len(pdf) == 0:
            return 0, None, None
        if any(c not in pdf.columns for c in idx):
            return None
        cols = []
        for c in idx:
            alias = self.schema.columns[c]
            s = pdf[c]
            if s.isna().any():
                return None  # NA index values: let the engine path decide
            kind = s.dtype.kind  # i/u int, f float, M datetime64, O object
            if alias == "int" and kind in "iu":
                cols.append([int(v) for v in s])
            elif alias == "float" and kind in "iuf":
                cols.append([float(v) for v in s])
            elif alias == "timestamp" and kind == "M":
                # engine cast truncates to second precision (schema.cast)
                cols.append(
                    [pd.Timestamp(v).floor("s").to_pydatetime() for v in s]
                )
            elif alias == "str" and kind == "O" and all(
                isinstance(v, str) for v in s
            ):
                cols.append(list(s))
            elif alias == "date" and kind == "O" and all(
                type(v) is dt.date for v in s
            ):
                cols.append(list(s))
            else:
                return None  # needs the engine cast — fall back to Spark
        rows = list(zip(*cols))
        return len(pdf), min(rows), max(rows)

    def _local_cast(self, pdf):
        """Vectorized driver-side equivalent of ``Schema.cast`` for
        engine-ready pandas inputs: returns the coerced frame (schema
        column order, exact physical dtypes, timestamps floored to the
        second like the engine cast) or None when any column needs the
        Spark cast (ISO strings, NA index values, unknown dtypes)."""
        import datetime as dtmod

        import pandas as pd

        cols = {}
        for name, alias in self.schema.columns.items():
            if name not in pdf.columns:
                return None
            s = pdf[name]
            kind = s.dtype.kind
            if alias == "int":
                if kind not in "iu":
                    return None
                cols[name] = s if s.dtype == "int64" else s.astype("int64")
            elif alias == "float":
                if kind not in "iuf":
                    return None
                cols[name] = (
                    s if s.dtype == "float64" else s.astype("float64")
                )
            elif alias == "timestamp":
                if kind != "M" or getattr(s.dtype, "tz", None) is not None:
                    return None
                if s.isna().any():
                    return None  # NaT breaks the integer floor below
                # integer floor-to-second, vectorized (dt.floor builds
                # rounding machinery — 25x slower at millions of rows);
                # numpy // floors toward -inf so pre-epoch values truncate
                # the same way as Spark's date_trunc
                unit = s.dtype.str.rsplit("[", 1)[-1].rstrip("]")
                per_s = {"ns": 10**9, "us": 10**6, "ms": 10**3, "s": 1}[
                    unit
                ]
                iv = s.to_numpy().view("i8")
                cols[name] = pd.Series(
                    (iv // per_s * 1_000_000).view("M8[us]"),
                    index=s.index,
                )
            elif alias == "str":
                if kind != "O" or s.isna().any() or not all(
                    isinstance(v, str) for v in s
                ):
                    return None
                cols[name] = s
            elif alias == "date":
                if kind != "O" or not all(type(v) is dtmod.date for v in s):
                    return None
                cols[name] = s
            else:
                return None
        out = pd.DataFrame(cols)
        # NA index values: let the engine path decide. int (cannot hold
        # NA) and timestamp (NaT-rejected above) index columns are
        # already proven non-null — only float/date/str still can be.
        nullable_idx = [
            c
            for c in self.schema.idx
            if self.schema.columns[c] not in ("int", "timestamp")
        ]
        if nullable_idx and out[nullable_idx].isna().any().any():
            return None
        return out

    def _pdf_is_sorted(self, pdf) -> bool:
        """Vectorized lexicographic is-sorted over the index columns.
        (`pd.MultiIndex.from_frame(...).is_monotonic_increasing`
        factorizes every column — seconds at millions of rows; the
        pairwise compare below is three numpy passes per column.)"""
        import numpy as np

        if len(pdf) < 2:
            return True
        idx = self.schema.idx
        if len(idx) == 1:
            return bool(pdf[idx[0]].is_monotonic_increasing)
        prev_eq = np.ones(len(pdf) - 1, dtype=bool)
        ok = np.zeros(len(pdf) - 1, dtype=bool)
        for c in idx:
            a = pdf[c].to_numpy()
            x, y = a[:-1], a[1:]
            ok |= prev_eq & (x < y)
            prev_eq &= x == y
        return bool(np.all(ok | prev_eq))

    def _local_bound(self, row):
        """One index-bound tuple from a coerced pandas row, normalized to
        the same Python types Spark's Row returns (the `_local_stats`
        contract — segment bounds must be byte-identical either path)."""
        import pandas as pd

        out = []
        for c in self.schema.idx:
            alias = self.schema.columns[c]
            v = row[c]
            if alias == "int":
                out.append(int(v))
            elif alias == "float":
                out.append(float(v))
            elif alias == "timestamp":
                out.append(pd.Timestamp(v).to_pydatetime())
            else:
                out.append(v)
        return tuple(out)

    def _local_cast_arrow(self, data: dict, validate_sorted: bool = False):
        """Zero-copy arrow twin of `_local_cast` for dict-of-numpy
        inputs whose columns are already engine-physical (int64 /
        float64 / datetime64) — the small-frequent-append shape of the
        reference's fragmentation bench. Skips pandas entirely: the
        block-manager construction alone costs ~8 ms per 500 k-row
        write (two full copies of the data), ~20% of the write floor
        the frag-500k rung measures. Returns ``(pa.Table, n, lo, hi)``
        with the table cast + floored + SORTED, or None to fall back to
        the pandas path (str/date columns, non-numpy values, NaT,
        NA index values). Content addresses are byte-identical to the
        pandas path (pinned by tests/test_series.py)."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        n = None
        arrays: dict = {}
        for name, alias in self.schema.columns.items():
            a = data.get(name)
            if not isinstance(a, np.ndarray) or a.ndim != 1:
                return None
            if n is None:
                n = len(a)
            elif len(a) != n:
                return None
            kind = a.dtype.kind
            if alias == "int":
                if kind not in "iu":
                    return None
                arrays[name] = (
                    a if a.dtype == np.int64 else a.astype(np.int64)
                )
            elif alias == "float":
                if kind not in "iuf":
                    return None
                arrays[name] = (
                    a if a.dtype == np.float64 else a.astype(np.float64)
                )
            elif alias == "timestamp":
                if kind != "M":
                    return None
                if not a.flags.c_contiguous:
                    # .view raises on strided arrays (e.g. arr[::2])
                    a = np.ascontiguousarray(a)
                iv = a.view("i8")
                if (iv == np.iinfo("i8").min).any():
                    return None  # NaT: engine path decides
                unit = a.dtype.str.rsplit("[", 1)[-1].rstrip("]")
                per_s = {
                    "ns": 10**9, "us": 10**6, "ms": 10**3, "s": 1
                }.get(unit)
                if per_s is None:
                    # coarse units (m/h/D/W/M/Y): the pandas path
                    # coerces them through pd.DataFrame — fall back
                    return None
                # same integer floor-to-second as _local_cast
                arrays[name] = (iv // per_s * 1_000_000).view("M8[us]")
            else:  # str/date: the pandas path owns the validation
                return None
        if not n:
            return None
        idx = self.schema.idx
        # NA guard for float INDEX columns (int/timestamp proven above)
        for c in idx:
            if self.schema.columns[c] == "float" and np.isnan(
                arrays[c]
            ).any():
                return None
        # lexicographic is-sorted (same three-pass form as
        # _pdf_is_sorted); stable lexsort when not
        if n > 1:
            prev_eq = np.ones(n - 1, dtype=bool)
            ok = np.zeros(n - 1, dtype=bool)
            for c in idx:
                col = arrays[c]
                x, y = col[:-1], col[1:]
                ok |= prev_eq & (x < y)
                prev_eq &= x == y
            if not bool(np.all(ok | prev_eq)):
                if validate_sorted:
                    raise ValueError(
                        "frame is not sorted by index columns"
                    )
                # stable lexsort == the pandas path's stable sort_values
                order = np.lexsort(
                    tuple(arrays[c] for c in reversed(idx))
                )
                arrays = {k: v[order] for k, v in arrays.items()}

        def bound(i):
            out = []
            for c in idx:
                alias = self.schema.columns[c]
                v = arrays[c][i]
                if alias == "int":
                    out.append(int(v))
                elif alias == "float":
                    out.append(float(v))
                else:  # timestamp — match _local_bound's types
                    out.append(pd.Timestamp(v).to_pydatetime())
            return tuple(out)

        pa_schema = self.schema.pyarrow_schema()
        cols = []
        for name, alias in self.schema.columns.items():
            # from_pandas=True: float NaN -> parquet NULL, exactly like
            # the pandas path (pa.Table.from_pandas) — the two write
            # paths must emit byte-identical blobs for the same data
            arr = pa.array(arrays[name], from_pandas=True)
            if alias == "timestamp":
                # metadata-only reinterpret: naive M8[us] == UTC wall
                # (exactly what from_pandas does against the tz field)
                arr = arr.cast(pa_schema.field(name).type)
            cols.append(arr)
        tbl = pa.Table.from_arrays(cols, schema=pa_schema)
        return tbl, n, bound(0), bound(n - 1)

    def _write_segment_files_local(self, pdf) -> tuple[str, str]:
        """Pandas entry to the driver-side segment writer: one
        `from_pandas` conversion, then the shared arrow-table path."""
        import pyarrow as pa

        table = pa.Table.from_pandas(
            pdf,
            schema=self.schema.pyarrow_schema(),
            preserve_index=False,
            # nthreads=1 below 100k rows: from_pandas otherwise spins up
            # a fresh thread pool per call (~1.5 ms), which dominates
            # the conversion itself on small append chunks
            nthreads=1 if len(pdf) < 100_000 else None,
        )
        return self._write_segment_files_table(table)

    def _write_segment_files_table(self, table) -> tuple[str, str]:
        """Driver-side twin of `_write_segment_files` for local inputs:
        slice the sorted frame into PAGE_LEN chunks, write each as one
        zstd parquet blob via pyarrow, sha1 + Merkle-combine into the
        content address, publish through the FS verbs (works on every
        backend — file, mem, HTTP). Same SKIP-WRITE dedup as the Spark
        path: an existing segment directory short-circuits the publish."""
        import hashlib
        import io
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        fs = self.collection.fs
        seg_prefix = self.collection.seg_prefix
        fs.makedirs(seg_prefix)
        # drop schema metadata (from_pandas attaches a b'pandas' JSON
        # blob that embeds the pandas VERSION): content addresses must
        # be a function of the data alone — identical whether the write
        # came through the arrow fast path, the pandas path, or a
        # future library version
        if table.schema.metadata:
            table = table.replace_schema_metadata(None)
        # Encodings: DELTA_BINARY_PACKED for the integer-backed columns
        # (int/timestamp/date — near-free on sorted index grids, ~0 bytes
        # for regular series), dictionary for strings, PLAIN for doubles
        # (Spark's vectorized reader rejects BYTE_STREAM_SPLIT; delta-v1
        # pages it reads fine — measured 30-40% smaller than its own
        # dictionary/PLAIN output on timestamp+double data).
        enc = {
            n_: "DELTA_BINARY_PACKED"
            for n_, a in self.schema.columns.items()
            if a in ("int", "timestamp", "date")
        }
        enc.update(
            {
                n_: "PLAIN"
                for n_, a in self.schema.columns.items()
                if a == "float"
            }
        )
        dict_cols = [
            n_ for n_, a in self.schema.columns.items() if a == "str"
        ]
        n = len(table)
        n_parts = max(1, -(-n // PAGE_LEN))
        part_len = PAGE_LEN
        if n_parts == 1 and n >= PAGE_LEN // 2:
            # A single near-full page is encode-LATENCY-bound: parquet
            # encodes one file on one thread, so a 500k-row append pays
            # the whole codec cost serially. Split it into two half
            # pages and let the pool below overlap the encodes (round
            # 12, VERDICT r11 #2 — measured 14.5 -> ~8 ms on the
            # frag-500k commit path). Layout stays under the PAGE_LEN
            # cap and the content address stays a deterministic
            # function of the data (same data -> same two slices).
            # ONE-TIME upgrade hazard (ADVICE r12): 250k-500k-row
            # writes staged as ONE segment before this change, so the
            # same rows now produce different content addresses —
            # "same data -> double-write no-op" does not hold ACROSS
            # the version boundary. A checkpointed foreachBatch /
            # Series.write microbatch replayed after upgrading commits
            # a duplicate revision instead of deduping; drain
            # replay-sensitive streams before upgrading (NOTES.md
            # "r12 half-page split" entry).
            n_parts, part_len = 2, -(-n // 2)

        def write_chunk(i: int) -> tuple[str, bytes]:
            chunk = table.slice(i * part_len, part_len)
            buf = io.BytesIO()
            pq.write_table(
                chunk,
                buf,
                # per-column codec hints from the schema mini-language
                # ("str*|gzip") override the zstd default where given
                compression=self.schema.parquet_compression(),
                use_dictionary=dict_cols,
                column_encoding=enc,
                # NaN-bearing float columns must not publish min/max
                # (see _nan_safe_stat_columns) — per CHUNK, so blob
                # bytes (= content addresses) stay identical to the
                # pre-refactor per-chunk writer
                write_statistics=_nan_safe_stat_columns(chunk),
            )
            b = buf.getvalue()
            return hashlib.sha1(b).hexdigest(), b  # noqa: S324 - address

        if n_parts == 1:
            pairs = [write_chunk(0)]
        else:  # pyarrow releases the GIL during encode/compress
            with ThreadPoolExecutor(max_workers=min(n_parts, 16)) as ex:
                pairs = list(ex.map(write_chunk, range(n_parts)))
        digests = [d for d, _ in pairs]
        blobs = [b for _, b in pairs]
        digest = fs.combine_sha1(digests)
        name = digest[:20]
        final_rel = f"{seg_prefix}/{name}"
        if not fs.exists(final_rel):
            # Stage under a hextime-stamped `_tmp-` dir then move,
            # like the Spark path: GC leaves young `_tmp-` (in-flight)
            # dirs alone and ages out crashed writers' leftovers after
            # the grace period, whereas publishing
            # file-by-file into the final dir races a concurrent gc()'s
            # soft-delete rename mid-write (caught by the chaos suite).
            from lakota_spark.changelog import staging_name

            tmp_rel = f"{seg_prefix}/{staging_name(uuid.uuid4().hex)}"
            for i, b in enumerate(blobs):
                fs.write_bytes_atomic(
                    f"{tmp_rel}/part-{i:05d}.parquet", b
                )
            try:
                fs.move(tmp_rel, final_rel)
            except Exception:
                if fs.exists(final_rel):  # identical-content racer won
                    fs.remove_tree(tmp_rel)
                else:
                    raise
        return name, digest

    # --------------------------------------------------------------- write

    def write(
        self,
        data,
        start=None,
        stop=None,
        closed: str = "b",
        validate_sorted: bool = False,
        checkpoint: bool | None = None,
        root: bool = False,
    ):
        """Write a frame as one content-addressed segment + one revision.
        ``root=True`` commits as a NEW ROOT, discarding the current state
        (reference `Series.write(root=True)` reset semantics; old history
        stays reachable as a branch until trimmed).

        ``start``/``stop`` may widen the interval beyond the data's own
        min/max — the widened range *deletes* pre-existing rows it shadows
        (`tests/series_test.py:251-371` semantics). Empty data + explicit
        bounds = range delete.

        The write runs two jobs over the input (bounds/count stats, then
        the file write — the count pins a session-independent partition
        layout, which content-addressing depends on). ``checkpoint``
        controls whether the input is materialized once between them via
        ``localCheckpoint(eager=False)``; default (None) auto-enables it
        when the input is a DataFrame whose plan contains a shuffle —
        i.e. exactly when recomputing it would repeat real work. Pass
        False to force recompute (cheap scans), True to force (expensive
        narrow transforms the heuristic can't see).
        """
        # Fully driver-local fast path: a dict/pandas input whose dtypes
        # are already engine-ready never touches Spark at all — cast,
        # sort, slice into PAGE_LEN parquet parts and content-address on
        # the driver (vectorized pandas/pyarrow). This is the data-local
        # choice, not a shortcut: the bytes are already in driver memory,
        # so a cluster round-trip (createDataFrame → shuffle → executor
        # write → digest job) adds 4-5 scheduler latencies of pure
        # overhead per append. Small frequent appends — the reference's
        # fragmentation bench (`bench/bench_fragmentation.py`) — hit this
        # path at ~ms cost; genuinely distributed inputs (DataFrames)
        # keep the executor-side write and sha1.
        df = pdf = None
        local_pdf = local_tbl = None
        if isinstance(data, dict):
            # dict-of-numpy engine-ready columns: straight to arrow,
            # zero pandas copies (the frag-rung fast path)
            fast = self._local_cast_arrow(data, validate_sorted)
            if fast is not None:
                local_tbl, n, lo, hi = fast
        if local_tbl is None and not isinstance(data, DataFrame):
            import pandas as pd

            pdf0 = None
            if isinstance(data, dict):
                pdf0 = pd.DataFrame(data)
            elif isinstance(data, pd.DataFrame):
                pdf0 = data
            if pdf0 is not None and len(pdf0) > 0:
                local_pdf = self._local_cast(pdf0)
        if local_tbl is not None:
            pass  # n/lo/hi already set; table sorted by _local_cast_arrow
        elif local_pdf is not None:
            if not self._pdf_is_sorted(local_pdf):
                if validate_sorted:
                    raise ValueError(
                        "frame is not sorted by index columns"
                    )
                # skip-sort: appends are usually presorted
                local_pdf = local_pdf.sort_values(
                    self.schema.idx, kind="stable"
                )
            # reset_index deep-copies every column (~0.2 s on the 80 MB
            # bench frame) — skip it when the index is already trivial
            import pandas as pd

            idx = local_pdf.index
            if not (
                isinstance(idx, pd.RangeIndex)
                and idx.start == 0
                and idx.step == 1
            ):
                local_pdf = local_pdf.reset_index(drop=True)
            n = len(local_pdf)
            lo = self._local_bound(local_pdf.iloc[0])
            hi = self._local_bound(local_pdf.iloc[-1])
        else:
            df, pdf = self._coerce_df_local(data)
            if checkpoint is None:
                checkpoint = isinstance(
                    data, DataFrame
                ) and "Exchange" in _physical_plan_str(df)
            if checkpoint:
                df = df.localCheckpoint(eager=False)
            # driver-local inputs (dict/pandas) with engine-ready index
            # dtypes skip the Spark stats job — one job per write, not two
            local = self._local_stats(pdf) if pdf is not None else None
            if local is not None:
                n, local_lo, local_hi = local
            else:
                # Pure-DataFrame input: SINGLE-PASS executor write. The
                # old flow ran a dedicated count/min/max job before the
                # write — a whole extra read of the input, which at
                # cluster scale doubles the scan cost of every bulk
                # ingest. Write first (sorted, PAGE_LEN-capped files),
                # then take n/lo/hi from the written files' footers and
                # edge rows. Bound-validation failures below leave the
                # published segment dir uncommitted — content-addressed
                # garbage the two-phase gc collects.
                if validate_sorted:
                    self._assert_sorted(df)
                (
                    exec_path,
                    exec_digest,
                    n,
                    exec_lo,
                    exec_hi,
                    exec_zmap,
                ) = self._write_segment_files_df(
                    df, known_sorted=validate_sorted
                )
        start_closed, stop_closed = CLOSED[closed]
        start = self.schema.coerce_bound(start)
        stop = self.schema.coerce_bound(stop)
        if n == 0:
            if start is None or stop is None:
                return None  # nothing to do
            return self._commit_segment(
                Segment(
                    label=self.label,
                    start=start,
                    stop=stop,
                    start_closed=start_closed,
                    stop_closed=stop_closed,
                    path=None,
                    length=0,
                ),
                root=root,
            )
        if local_tbl is None and local_pdf is None:
            if local is not None:
                lo, hi = tuple(local_lo), tuple(local_hi)
            else:
                lo, hi = exec_lo, exec_hi
        # explicit bounds may only widen (reference asserts containment,
        # `lakota/series.py:117-121`): narrower bounds would silently hide
        # rows of the new segment at read time while length=n still counts
        # them (meta_len/tail pruning would overstate)
        eff_start = start if start is not None else lo
        eff_stop = stop if stop is not None else hi
        if len(eff_start) != len(self.schema.idx) or len(eff_stop) != len(
            self.schema.idx
        ):
            raise ValueError("write bounds must cover every index column")
        if start is not None and (
            tuple(start) > lo or (tuple(start) == lo and not start_closed)
        ):
            raise ValueError(
                f"start bound {start!r} excludes data rows (min index {lo!r})"
            )
        if stop is not None and (
            tuple(stop) < hi or (tuple(stop) == hi and not stop_closed)
        ):
            raise ValueError(
                f"stop bound {stop!r} excludes data rows (max index {hi!r})"
            )
        if validate_sorted and local_pdf is None and local is not None:
            self._assert_sorted(df)

        from lakota_spark import zonemap

        zmap = None
        if local_tbl is not None:
            path, digest = self._write_segment_files_table(local_tbl)
            zmap = zonemap.compute_from_arrow(
                local_tbl, self.schema.idx, dict(self.schema.columns)
            )
        elif local_pdf is not None:
            path, digest = self._write_segment_files_local(local_pdf)
            zmap = zonemap.compute_from_pdf(local_pdf, self.schema)
        elif local is None:
            path, digest = exec_path, exec_digest  # already written above
            zmap = exec_zmap
        else:
            path, digest = self._write_segment_files(df, n)
            if pdf is not None:
                zmap = zonemap.compute_from_pdf(pdf, self.schema)
        meta = {"digest": digest}
        if zmap:
            # value-column zone map: consulted by frame()/df() masked
            # reads to skip whole segments (zonemap.prune)
            meta["zmap"] = zmap
        return self._commit_segment(
            Segment(
                label=self.label,
                start=eff_start,
                stop=eff_stop,
                start_closed=start_closed if start is not None else True,
                stop_closed=stop_closed if stop is not None else True,
                path=path,
                length=n,
                meta=meta,
            ),
            root=root,
        )

    def _assert_sorted(self, df: DataFrame) -> None:
        """Reference write-path invariant (`lakota/series.py:94`). Opt-in.

        Fully distributed and JVM-side (round 8; was Arrow/mapInPandas —
        measured 7.6 s on a 526-partition 5.26M-row frame from the
        per-task Python round-trip alone, vs ~0.4 s for this form):
        per-partition descent count + first/last index tuples via ONE
        narrow exchange of the index columns only (hash by partition id,
        whole-stage codegen window + partial agg), then the driver
        compares the P tiny boundary tuples in input-partition order.
        The round-1 sin this replaced was a GLOBAL single-task window;
        the per-pid exchange here carries index columns only — a sliver
        of the full-row shuffle the pre-sorted fast path skips.
        """
        rep = self._sorted_report(df)
        if any((r["n_desc"] or 0) > 0 for r in rep):
            raise ValueError("frame is not sorted by index columns")
        for prev, cur in zip(rep, rep[1:]):
            last = tuple(prev["last"])
            first = tuple(cur["first"])
            if first < last:
                raise ValueError(
                    "frame is not sorted by index columns "
                    f"(partition boundary {last!r} > {first!r})"
                )

    def _sorted_report(self, df: DataFrame):
        """Per-input-partition ``(n_desc, first, last)`` rows, sorted by
        partition id: ``n_desc`` counts adjacent descents inside the
        partition (struct comparison = lexicographic index-tuple order,
        row order pinned by monotonically_increasing_id, which is
        consecutive within a partition); ``first``/``last`` are the
        partition's edge index tuples via order-aware min_by/max_by."""
        from pyspark.sql import Window

        idx = list(self.schema.idx)
        base = (
            df.select(F.struct(*[F.col(c) for c in idx]).alias("_s"))
            .withColumn("_pid", F.spark_partition_id())
            .withColumn("_mid", F.monotonically_increasing_id())
        )
        w = Window.partitionBy("_pid").orderBy("_mid")
        desc = (F.col("_s") < F.lag("_s").over(w)).cast("int")
        rep = (
            base.withColumn("_desc", desc)
            .groupBy("_pid")
            .agg(
                F.sum("_desc").alias("n_desc"),
                F.min_by("_s", "_mid").alias("first"),
                F.max_by("_s", "_mid").alias("last"),
            )
            .collect()
        )
        rep.sort(key=lambda r: r["_pid"])
        return rep

    def _df_presorted(self, df: DataFrame) -> bool:
        """True iff ``df`` is already globally sorted by the index
        across partitions in partition order — `_assert_sorted`'s check
        as a predicate. One column-pruned pass over the index columns
        plus one narrow per-pid exchange of those columns only: at
        cluster scale that is a sliver of the bytes the skipped
        range-sample + full-row sort shuffle would touch, which is why
        the pre-sorted fast path in `_write_segment_files_df` pays it
        unconditionally."""
        try:
            self._assert_sorted(df)
        except ValueError:
            return False
        return True

    def _write_segment_files(self, df: DataFrame, n_rows: int) -> tuple[str, str]:
        """Write sorted Parquet, content-address the result.

        Range-partition so files carry disjoint, sorted index ranges (file
        min/max stats then prune exactly like the reference's per-segment
        bounds). The directory is renamed to the sha1 of its contents —
        identical data written twice lands on the same path and the second
        write is dropped (reference SKIP-WRITE, `lakota/pod.py:201-204`).
        """
        n_parts = max(1, -(-n_rows // PAGE_LEN))
        idx_cols = [F.col(c) for c in self.schema.idx]
        out = (
            df.repartitionByRange(n_parts, *idx_cols)
            .sortWithinPartitions(*idx_cols)
            if n_parts > 1
            else df.coalesce(1).sortWithinPartitions(*idx_cols)
        )
        name, digest = self._publish_parts(out)
        return name, digest

    def _write_segment_files_df(self, df: DataFrame, known_sorted: bool = False):
        """Single-pass executor write (round 7): globally range-sort,
        write PAGE_LEN-capped sorted parquet files, then derive n/lo/hi
        from the written files (`_files_stats`) — no prior stats job, so
        the input is read ONCE (plus the range sampler) instead of
        twice. At cluster scale the dropped stats job is a whole extra
        scan of every bulk ingest.

        Round 8 (r7 ask #6): ALREADY-SORTED input — the common
        append-ingest shape — skips the sort entirely: a narrow
        column-pruned boundary check (`_df_presorted`, or
        ``known_sorted=True`` when `write(validate_sorted=True)` has
        just proven it) costs one idx-column pass, and on success the
        input's own partition layout is written as-is — no range
        sampler, no full-width shuffle. Gated on a sane input layout
        (see the inline comment): over-partitioned input and
        narrow-row frames go through the unchanged sort path, where
        the range exchange doubles as compaction and the skipped
        sampler is a minority cost (measured — NOTES r8).

        Content addressing is unchanged (per-file sha1 job, Merkle
        combine, SKIP-WRITE dedup). The file layout — and hence the
        address — is deterministic for a given input partitioning on
        BOTH paths (the sorted path preserves input partitions; the
        sort path's range boundaries come from Spark's seeded reservoir
        sampler); the two paths may address the same rows differently,
        exactly as the driver-local and executor paths already do —
        SKIP-WRITE dedup is per-path, correctness never depends on it.

        Returns ``(name, digest, n, lo, hi, zmap)``; empty input
        returns ``(None, None, 0, None, None, None)`` with nothing
        published.
        """
        idx_cols = [F.col(c) for c in self.schema.idx]
        # The fast path keeps the INPUT partition layout, so it is only
        # taken when that layout is sane (≤ 2x parallelism): confetti
        # inputs (a 526-slice createDataFrame measured 526 tiny segment
        # files) still go through the sort, whose range exchange is also
        # the compaction. And the auto-check only pays when the index is
        # a sliver of the row (text-wide tables): on a narrow
        # (timestamp, float) frame the idx-only check shuffle ≈ the full
        # sort it would skip (measured 0.9 s check vs 0.5 s sort at
        # 5.26M rows) — the partition gate keeps the check off exactly
        # the shapes where it cannot win.
        try:
            sc = df.sparkSession.sparkContext
            sane_parts = 0 < df.rdd.getNumPartitions() <= 2 * max(
                sc.defaultParallelism, 1
            )
        except Exception:  # noqa: BLE001 — Connect: no partition-count
            # introspection; take the sort path, whose range exchange
            # is also the compaction (always correct, never confetti)
            sane_parts = False
        out = (
            df
            if sane_parts and (known_sorted or self._df_presorted(df))
            else df.sort(*idx_cols)
        )
        return self._publish_parts(
            out, max_records=PAGE_LEN, with_stats=True
        )

    def _publish_parts(
        self,
        out: DataFrame,
        max_records: int | None = None,
        with_stats: bool = False,
    ):
        """Shared staging/digest/publish tail of both segment-write
        paths: write ``out`` to a staging location, content-address the
        part files, publish under ``segments/<sha1[:20]>`` with
        SKIP-WRITE dedup (reference `lakota/pod.py:201-204`).

        NB: the address hashes CONTENT only — Spark part-file names
        embed a random UUID. Per-file sha1 runs as a distributed job on
        the executors (no segment bytes through the driver); only the
        40-char digests are collected and Merkle-combined. On a
        non-Hadoop backend (HTTP repo) Spark writes to LOCAL staging —
        still distributed compute, local disk IO — and the part files
        publish through the FS verbs; identical bytes/ordering to the
        direct path, so content addresses agree across backends
        (push/pull dedup relies on this).

        ``with_stats=True`` also derives ``(n, lo, hi, zmap)`` from
        the written files (`_files_stats` — the value-column zone map
        rides the footers that are already open) and returns the
        6-tuple ``(name, digest, n, lo, hi, zmap)`` —
        ``(None, None, 0, None, None, None)`` for empty input, with
        nothing published. Otherwise returns ``(name, digest)``.
        """
        fs = self.collection.fs
        seg_prefix = self.collection.seg_prefix
        fs.makedirs(seg_prefix)

        def write_to(uri: str) -> None:
            w = out.write.mode("overwrite")
            if max_records is not None:
                w = w.option("maxRecordsPerFile", max_records)
            w.parquet(uri)

        def address_and_publish(staging_fs, staging_rel, publish):
            parts = sorted(
                p
                for p in staging_fs.ls(staging_rel)
                if p.endswith(".parquet")
            )
            stats = None
            if with_stats:
                stats = self._files_stats(staging_fs, staging_rel, parts)
                if stats[0] == 0:
                    return None, None, 0, None, None, None
            pref = f"{staging_rel}/" if staging_rel else ""
            digest = fs.combine_sha1(
                staging_fs.files_sha1(
                    [pref + p for p in parts], spark=out.sparkSession
                )
            )
            name = digest[:20]
            publish(name, parts)
            return (name, digest, *stats) if with_stats else (name, digest)

        if fs.spark_readable:
            from lakota_spark.changelog import staging_name

            tmp_rel = f"{seg_prefix}/{staging_name(uuid.uuid4().hex)}"
            write_to(fs.spark_uri(tmp_rel))

            def publish_move(name, parts):
                final_rel = f"{seg_prefix}/{name}"
                if fs.exists(final_rel):
                    fs.remove_tree(tmp_rel)  # content dedup: exists
                else:
                    fs.move(tmp_rel, final_rel)

            result = address_and_publish(fs, tmp_rel, publish_move)
            if with_stats and result[0] is None:
                fs.remove_tree(tmp_rel)  # empty input: nothing published
            return result
        import shutil
        import tempfile

        staging = tempfile.mkdtemp(prefix="lakota-stage-")
        try:
            write_to("file://" + staging)
            local = FS(staging)

            def publish_copy(name, parts):
                final_rel = f"{seg_prefix}/{name}"
                if not fs.exists(final_rel):
                    for part in parts:
                        fs.write_bytes_atomic(
                            f"{final_rel}/{part}", local.read_bytes(part)
                        )

            return address_and_publish(local, "", publish_copy)
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    def _files_stats(self, fs, dir_rel: str, parts: list[str]):
        """``(n, lo, hi, zmap)`` straight from just-written SORTED
        segment files: footers give exact per-file row counts, and
        because the files are range-partitioned and internally sorted,
        the global min/max index tuples are the FIRST row of the first
        non-empty file and the LAST row of the last one — exact for
        every index type including strings (parquet column statistics
        may be truncated; actual edge rows never are). The value-column
        zone map (`zonemap.compute_from_parquet_meta`, numeric columns
        only) reuses the same already-open footers. Driver-side cost:
        one footer read per file plus two partial row reads."""
        import datetime as dtmod

        import pyarrow.parquet as pq

        pafs = getattr(fs, "fs", None)  # pyarrow filesystem handle

        def open_pf(p):
            rel = f"{dir_rel}/{p}" if dir_rel else p
            full = fs.full(rel)
            if pafs is not None:
                return pq.ParquetFile(pafs.open_input_file(full))
            return pq.ParquetFile(full)

        idx = list(self.schema.idx)
        pfs = []
        try:
            counts = []
            for p in parts:
                pf = open_pf(p)
                pfs.append(pf)
                counts.append(pf.metadata.num_rows)
            n = sum(counts)
            if n == 0:
                return 0, None, None, None
            from lakota_spark import zonemap

            zmap = zonemap.compute_from_parquet_meta(
                [pf.metadata for pf in pfs], self.schema
            )
            first = next(pf for pf, c in zip(pfs, counts) if c)
            last = next(
                pf for pf, c in zip(reversed(pfs), reversed(counts)) if c
            )
            lo_row = next(
                first.iter_batches(batch_size=1, columns=idx)
            ).to_pylist()[0]
            rg = last.metadata.num_row_groups - 1
            while last.metadata.row_group(rg).num_rows == 0:
                rg -= 1
            tbl = last.read_row_group(rg, columns=idx)
            hi_row = tbl.slice(tbl.num_rows - 1, 1).to_pylist()[0]
        finally:
            for pf in pfs:
                try:
                    pf.close()
                except Exception:
                    pass

        def norm(v):
            # normalize to the plain-datetime bound types the Spark-Row
            # and driver-local paths produce: pyarrow surfaces
            # pd.Timestamp for ns-unit (INT96) files and may carry a tz
            # depending on the parquet annotation
            if isinstance(v, dtmod.datetime):
                if v.tzinfo is not None:
                    v = v.astimezone(dtmod.timezone.utc).replace(
                        tzinfo=None
                    )
                if type(v) is not dtmod.datetime:  # pd.Timestamp subclass
                    v = dtmod.datetime(
                        v.year,
                        v.month,
                        v.day,
                        v.hour,
                        v.minute,
                        v.second,
                        v.microsecond,
                    )
            return v

        lo = tuple(norm(lo_row[c]) for c in idx)
        hi = tuple(norm(hi_row[c]) for c in idx)
        return n, lo, hi, zmap

    def _commit_segment(self, seg: Segment, root: bool = False):
        return self.collection.apply_segments([seg], root=root)

    # ---------------------------------------------------------------- read

    def segments(self, start=None, stop=None, before=None, closed: str = "b"):
        """Pruned segment list (reference `Series.segments`,
        `lakota/series.py:36-54`)."""
        start = self.schema.coerce_bound(start)
        stop = self.schema.coerce_bound(stop)
        start_closed, stop_closed = CLOSED[closed]
        snap = self.collection.snapshot(before=before)
        return snap.for_label(
            self.label, start, stop, start_closed, stop_closed
        )

    def frame(
        self,
        start=None,
        stop=None,
        before=None,
        closed: str = "b",
        select: list[str] | None = None,
        limit: int | None = None,
        offset: int | None = None,
        sort: bool = True,
        mask: str | None = None,
    ) -> DataFrame:
        """``mask=`` takes an s-expr predicate (``"(< self.value 28)"``,
        reference `lakota/frame.py:157-169`) applied INSIDE the read:
        on the classic path it reaches the parquet scan (Catalyst
        pushdown), and on the sorted fast path its pushable subset
        compiles to a pyarrow filter inside the ordered mapInArrow scan
        (row-group pruning + exact arrow-side filter — VERDICT r9 #3:
        a filter written ON TOP of the mapInArrow relation can never be
        pushed, so hand it to ``mask=`` instead). Masks outside the
        pushable subset fall back to the classic path; KV series apply
        the mask AFTER last-writer-wins dedup (filtering first could
        resurrect shadowed rows)."""
        segs = self.segments(start, stop, before, closed)
        cols = select or list(self.schema.columns)
        # KV dedup is only NEEDED when two queried segments could hold
        # the same key — i.e. their intervals overlap. A pairwise-
        # disjoint queried set (the append-heavy registry shape) makes
        # last-writer-wins a per-row no-op, so the read drops the
        # window exchange entirely and qualifies for the same raw-scan
        # / exchange-free-sorted fast paths as a non-KV series
        # (round 13; differential + plan contracts in
        # tests/test_zonemap.py / test_plans.py).
        kv_dedup = self.schema.kv
        if kv_dedup:
            from lakota_spark import zonemap

            kv_dedup = not zonemap.pairwise_disjoint(
                [s for s in segs if s.path]
            )
        mask_col = None
        mask_plan = mask_fields = None
        if mask is not None:
            from lakota_spark import sexpr as _sexpr

            mc = _sexpr.evaluate(_sexpr.parse(mask))
            mask_col = mc.value if isinstance(mc, _sexpr.Alias) else mc
            mask_plan, mask_fields = self._compile_mask(mask)
            if mask_plan is not None:
                # value-column zone maps: skip whole segments the mask
                # provably cannot match. Overlapping KV goes through
                # the shadowing-aware variant (round 13): only segments
                # that shadow NOTHING may drop — dropping a masked-out
                # newer segment would otherwise resurrect the older
                # rows it shadows (mask applies after last-writer-wins
                # dedup). Disjoint KV shadows nothing by construction,
                # so the plain pruner is safe and maximal.
                from lakota_spark import zonemap

                segs = (
                    zonemap.prune_kv(segs, mask_plan)
                    if kv_dedup
                    else zonemap.prune(segs, mask_plan)
                )
        if sort:
            # Sorted reads of clean (never-clipped) segments skip the
            # global orderBy entirely (VERDICT r8 #2): segments are
            # pairwise disjoint and internally sorted, so an interval-
            # ordered scan IS the sorted frame — no range exchange, no
            # Sort node (see `_ordered_scan`).
            fast = None
            if mask is None or mask_plan is not None:
                fast = self._ordered_scan(
                    segs,
                    self.schema.coerce_bound(start),
                    self.schema.coerce_bound(stop),
                    *CLOSED[closed],
                    cols=cols,
                    mask_plan=mask_plan,
                    mask_cols=tuple(mask_fields or ()),
                    kv_ok=self.schema.kv and not kv_dedup,
                )
            if fast is not None:
                if offset:
                    fast = fast.offset(offset)
                if limit is not None:
                    fast = fast.limit(limit)
                return fast

        # The query-range predicate MUST be handed to the scan before the
        # _seg_key projection: input_file_name() is nondeterministic, so
        # Catalyst will not push any filter placed above it down to parquet.
        def _pred(d):
            d = self._apply_range(
                d,
                self.schema.coerce_bound(start),
                self.schema.coerce_bound(stop),
                *CLOSED[closed],
            )
            if mask_col is not None and not kv_dedup:
                d = d.where(mask_col)
            return d

        df = self._read_segments(segs, range_pred=_pred, kv=kv_dedup)
        if kv_dedup:
            df = self._kv_dedup(df)
            if mask_col is not None:
                df = df.where(mask_col)
        if sort:
            df = df.orderBy(*[F.col(c) for c in self.schema.idx])
        if offset:
            df = df.offset(offset)
        if limit is not None:
            df = df.limit(limit)
        return df.select(*cols)

    def _compile_mask(self, mask: str | None, tz_aware: bool = True):
        """Compile ``mask`` to a pyarrow filter plan for the ordered
        scan: `sexpr.to_filter_plan` handles the pushable subset,
        literals compared to timestamp index/value columns coerce to
        UTC datetimes (matching the post-cast arrow schema), and the
        plan is VALIDATED driver-side against an empty cast table so a
        type the executors would choke on falls back to the classic
        path instead of failing mid-job. Returns (plan, fields) or
        (None, None) when the mask is absent or not fast-path-safe.
        ``tz_aware=False`` keeps timestamp literals naive for the
        driver-local reader, whose cast target is naive ns."""
        if mask is None:
            return None, None
        from lakota_spark import sexpr as _sexpr

        compiled = _sexpr.to_filter_plan(mask)
        if compiled is None:
            return None, None
        plan, fields = compiled
        if any(c not in self.schema.columns for c in fields):
            return None, None
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import TimestampType

        ts_cols = {
            f.name
            for f in self.schema.struct_type().fields
            if isinstance(f.dataType, TimestampType)
        }

        def coerce(node):
            kind = node[0]
            if kind == "cmp":
                _, op, a, b = node
                if a[0] == "field" and a[1] in ts_cols and b[0] == "lit":
                    b = ("lit", self._ts_lit(b[1], tz_aware))
                elif b[0] == "field" and b[1] in ts_cols and a[0] == "lit":
                    a = ("lit", self._ts_lit(a[1], tz_aware))
                return ("cmp", op, a, b)
            if kind in ("and", "or"):
                return (kind, [coerce(x) for x in node[1]])
            if kind == "not":
                return ("not", coerce(node[1]))
            if kind == "in" and node[1][0] == "field" and node[1][1] in ts_cols:
                return (
                    "in",
                    node[1],
                    [self._ts_lit(v, tz_aware) for v in node[2]],
                )
            return node

        try:
            plan = coerce(plan)
            # Spark totals-orders doubles with NaN greatest; Arrow
            # follows IEEE (NaN fails every comparison). Rewrite float
            # comparisons so the arrow evaluation — and the zone-map
            # pruning that consumes the same plan — matches the classic
            # Catalyst path on NaN rows.
            plan = _sexpr.spark_nan_semantics(
                plan,
                {
                    c
                    for c, k in self.schema.columns.items()
                    if k == "float"
                },
            )
            if tz_aware:
                probe = to_arrow_schema(
                    self.schema.struct_type()
                ).empty_table()
            else:
                import pyarrow as pa

                pa_ns = {"timestamp": pa.timestamp("ns"),
                         "date": pa.date32(), "int": pa.int64(),
                         "float": pa.float64(), "str": pa.string()}
                probe = pa.schema(
                    [(c, pa_ns[t]) for c, t in self.schema.columns.items()]
                ).empty_table()
            probe.filter(_arrow_mask_expr(plan))
        except Exception:  # noqa: BLE001 — any rejection means classic path
            return None, None
        return plan, fields

    @staticmethod
    def _ts_lit(v, tz_aware: bool = True):
        """Timestamp literal for an arrow-side mask: parse strings /
        naive datetimes; UTC-localized for the executor reader (its
        cast schema reads timestamps as tz=UTC; session timezone is
        UTC), naive for the driver-local ns reader."""
        import pandas as pd

        ts = pd.Timestamp(v)
        out = ts.to_pydatetime()
        if tz_aware and out.tzinfo is None:
            out = out.replace(tzinfo=dt.timezone.utc)
        return out

    def df(self, *args, **kwargs):
        """pandas sink (`lakota/series.py:340-358`).

        When the backend exposes a pyarrow filesystem and every pruned
        segment is clean (never clipped by an overlay) and the
        collection is not KV, the frame is read DRIVER-SIDE with
        pyarrow — parallel file reads, zero Spark jobs, and the global
        sort comes free (clean segments are pairwise disjoint and
        internally sorted, so interval-ordered concatenation IS the
        sorted frame). Everything else falls back to
        ``frame(...).toPandas()``; both paths return identical frames
        (covered by the differential tests that call ``df()``).

        The fallback catches ONLY environment-shaped failures (IO /
        Arrow / OS errors — e.g. a backend that advertised
        arrow_readable but can't serve a path) and counts them in
        ``Series.df_fallbacks`` so a silent demotion to the ~100×
        slower Spark path is observable. Programming errors in
        ``_df_local`` propagate — tests must see them, not a slow
        green run."""
        try:
            out = self._df_local(*args, **kwargs)
        except (OSError, pa_lib.ArrowInvalid, pa_lib.ArrowException) as exc:
            Series.df_fallbacks.append(
                f"{type(exc).__name__}: {exc}"
            )
            del Series.df_fallbacks[:-20]  # bounded ring
            out = None
        if out is not None:
            return out
        return self.frame(*args, **kwargs).toPandas()

    def _df_local(
        self,
        start=None,
        stop=None,
        before=None,
        closed: str = "b",
        select: list[str] | None = None,
        limit: int | None = None,
        offset: int | None = None,
        sort: bool = True,
        mask: str | None = None,
    ):
        fs = self.collection.fs
        if not getattr(fs, "arrow_readable", False):
            return None
        mask_plan = mask_fields = None
        if mask is not None:
            # naive-ns literals: the local cast target is timestamp[ns]
            mask_plan, mask_fields = self._compile_mask(
                mask, tz_aware=False
            )
            if mask_plan is None:
                return None  # non-pushable mask -> the Spark path
        segs = self.segments(start, stop, before, closed)
        live = [s for s in segs if s.path]
        if self.schema.kv:
            from lakota_spark import zonemap

            if not zonemap.pairwise_disjoint(live):
                # overlapping KV needs last-writer-wins dedup — only
                # the Spark path implements it. Disjoint KV (round 13)
                # reads driver-local like any other series, with the
                # commit-ordered snapshot list re-sorted to interval
                # order (concat order below IS the sort order).
                return None
            live = sorted(live, key=lambda s: tuple(s.start))
        if mask_plan is not None:
            from lakota_spark import zonemap

            live = zonemap.prune(live, mask_plan)
        if any(s.meta.get("clip") for s in live):
            return None  # narrowed bounds need the per-segment filter
        import pandas as pd

        cols = select or list(self.schema.columns)
        if not live:
            import pyarrow as pa

            pa_ns = {
                "timestamp": pa.timestamp("ns"),
                "date": pa.date32(),
                "int": pa.int64(),
                "float": pa.float64(),
                "str": pa.string(),
            }
            return pa.schema(
                [(c, pa_ns[self.schema.columns[c]]) for c in cols]
            ).empty_table().to_pandas()
        import pyarrow.parquet as pq
        from concurrent.futures import ThreadPoolExecutor

        idx = self.schema.idx
        read_cols = list(
            dict.fromkeys([*cols, *idx, *(mask_fields or ())])
        )
        start_b = self.schema.coerce_bound(start)
        stop_b = self.schema.coerce_bound(stop)
        start_closed, stop_closed = CLOSED[closed]
        # coarse row-group pruning on the leading index column (the same
        # shape `_bound_pred` pushes to the Spark scan)
        filters = []
        if start_b is not None:
            op = ">=" if (start_closed or len(start_b) > 1) else ">"
            filters.append((idx[0], op, start_b[0]))
        if stop_b is not None:
            op = "<=" if (stop_closed or len(stop_b) > 1) else "<"
            filters.append((idx[0], op, stop_b[0]))
        seg_prefix = self.collection.seg_prefix
        files = []
        for s in live:  # interval order == global sort order
            d = f"{seg_prefix}/{s.path}"
            files.extend(
                f"{d}/{nm}" for nm in fs.ls(d) if nm.endswith(".parquet")
            )

        def read_one(rel: str):
            return pq.read_table(
                fs.full(rel),
                filesystem=fs.fs,
                columns=read_cols,
                filters=filters or None,
            )

        if len(files) == 1:
            tables = [read_one(files[0])]
        else:
            with ThreadPoolExecutor(max_workers=min(16, len(files))) as ex:
                tables = list(ex.map(read_one, files))
        # Stay in arrow until ONE to_pandas at the end: the naive-pandas
        # shape (per-file to_pandas + pd.concat + dtype normalize +
        # column select) costs four full-frame copies — measured 4 s on
        # 5.26M rows where the arrow-level concat/cast/select runs in
        # 0.09 s. The cast also unifies mixed physical timestamps
        # (Spark INT96 → ns-naive, driver-written us/UTC → ns-naive
        # wall values — the session timezone is UTC) to the exact dtype
        # Spark's toPandas yields.
        import pyarrow as pa

        pa_ns = {
            "timestamp": pa.timestamp("ns"),
            "date": pa.date32(),
            "int": pa.int64(),
            "float": pa.float64(),
            "str": pa.string(),
        }
        target = pa.schema(
            [(c, pa_ns[self.schema.columns[c]]) for c in read_cols]
        )
        tbl = (
            pa.concat_tables(tables, promote_options="permissive")
            .select(read_cols)
            .cast(target)
        )
        if mask_plan is not None:
            # arrow-side exact mask before the single to_pandas
            tbl = tbl.filter(_arrow_mask_expr(mask_plan))
        pdf = tbl.to_pandas(self_destruct=True)
        if start_b is not None:
            pdf = pdf[
                self._pandas_bound_mask(pdf, start_b, start_closed, True)
            ]
        if stop_b is not None:
            pdf = pdf[
                self._pandas_bound_mask(pdf, stop_b, stop_closed, False)
            ]
        if start_b is not None or stop_b is not None:
            pdf = pdf.reset_index(drop=True)
        if offset:
            pdf = pdf.iloc[offset:].reset_index(drop=True)
        if limit is not None:
            pdf = pdf.iloc[:limit]
        if list(pdf.columns) != cols:
            pdf = pdf[cols]
        return pdf

    def _read_run_local(self, segs: list[Segment]):
        """Driver-local pandas frame of a CLEAN segment run — the defrag
        fast path: a fragmented run is thousands of tiny files whose
        total bytes are driver-sized, so rewriting it through a Spark
        job pays pure scheduler/discovery overhead (measured 37.6 s for
        a 10k-segment defrag that the pyarrow path does in ~2 s). Same
        concat/cast pipeline as `_df_local`, limited to the given
        segments, in run order (clean segments are disjoint and sorted,
        so run-ordered concat IS the sorted frame). Returns None when
        the run disqualifies (non-arrow FS, OVERLAPPING-KV, clipped
        pieces — those need the resolving read / per-segment bounds
        re-filter only the Spark path implements). A pairwise-disjoint
        KV run qualifies (round 13): last-writer-wins is a per-row
        no-op, and KV snapshots keep the label block start-sorted
        (`Snapshot.overlay`'s bisect insert), so run-ordered concat is
        the sorted frame here too — fragmented KV registries defrag at
        pyarrow speed instead of one Spark job per run."""
        fs = self.collection.fs
        if not getattr(fs, "arrow_readable", False):
            return None
        if self.schema.kv:
            from lakota_spark import zonemap

            if not zonemap.pairwise_disjoint(
                [s for s in segs if s.path]
            ):
                return None
        if any(s.meta.get("clip") or not s.path for s in segs):
            return None
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow as pa
        import pyarrow.parquet as pq

        cols = list(self.schema.columns)
        seg_prefix = self.collection.seg_prefix
        files = []
        for s in segs:
            d = f"{seg_prefix}/{s.path}"
            files.extend(
                f"{d}/{nm}" for nm in fs.ls(d) if nm.endswith(".parquet")
            )
        if not files:
            return None
        if len(files) > 64:
            # one C++-parallel dataset scan: per-file pq.read_table calls
            # are GIL-bound python overhead that dominates thousands of
            # tiny files (profiled 2.8 s of lock churn at 4k files).
            # Scanner.to_table materializes in fragment (= given-path)
            # order, preserving the run's sort order.
            import pyarrow.dataset as pads

            tables = [
                pads.dataset(
                    [fs.full(f) for f in files],
                    format="parquet",
                    filesystem=fs.fs,
                ).to_table(columns=cols)
            ]
        else:

            def read_one(rel: str):
                return pq.read_table(
                    fs.full(rel), filesystem=fs.fs, columns=cols
                )

            with ThreadPoolExecutor(max_workers=min(16, len(files))) as ex:
                tables = list(ex.map(read_one, files))
        pa_ns = {
            "timestamp": pa.timestamp("ns"),
            "date": pa.date32(),
            "int": pa.int64(),
            "float": pa.float64(),
            "str": pa.string(),
        }
        target = pa.schema(
            [(c, pa_ns[self.schema.columns[c]]) for c in cols]
        )
        tbl = (
            pa.concat_tables(tables, promote_options="permissive")
            .select(cols)
            .cast(target)
        )
        # the pandas hop below folds real NaN into null
        # (`Table.from_pandas` on the rewrite cannot tell them apart) —
        # a defrag must not corrupt Spark-written NaN data, so such
        # runs take the Spark rewrite path instead
        import pyarrow.compute as pc

        for c in cols:
            if self.schema.columns[c] == "float" and pc.any(
                pc.is_nan(tbl.column(c))
            ).as_py():
                return None
        return tbl.to_pandas(self_destruct=True)

    def _pandas_bound_mask(self, pdf, bound, closed: bool, is_start: bool):
        """Pandas twin of `_bound_pred`: lexicographic prefix compare
        over the leading ``len(bound)`` index columns."""
        import numpy as np

        idx = self.schema.idx
        strict = np.zeros(len(pdf), dtype=bool)
        eq_all = np.ones(len(pdf), dtype=bool)
        for c, v in zip(idx[: len(bound)], bound):
            s = pdf[c]
            cmp = (s > v) if is_start else (s < v)
            strict |= eq_all & cmp.to_numpy()
            eq_all &= (s == v).to_numpy()
        return strict | eq_all if closed else strict

    def _resurrect_missing(self, paths: list[str]) -> None:
        """Move referenced segment dirs back out of GC trash (see
        `_read_segments`); missing dirs with no trash copy are left for
        the retry to fail loudly on."""
        from lakota_spark.repo import TRASH_MARK

        fs = self.collection.fs
        seg_prefix = self.collection.seg_prefix
        listing = None
        for p in paths:
            if fs.exists(f"{seg_prefix}/{p}"):
                continue
            if listing is None:
                listing = fs.ls(seg_prefix)
            for name in listing:
                if name.startswith(p + TRASH_MARK):
                    fs.move(f"{seg_prefix}/{name}", f"{seg_prefix}/{p}")
                    break

    def _read_paths(self, paths: list[str]) -> DataFrame:
        """Parquet scan over segment dirs with the GC self-heal retry.

        GC bury race (inherited from the reference `lakota/repo.py:
        368-375`): a concurrent gc() lists segments BEFORE scanning
        revisions, so a segment written-but-not-yet-committed can be
        soft-deleted; the reference only re-enables it on the NEXT
        gc pass, failing reads in between. Self-heal instead:
        resurrect referenced-but-buried segments from trash and
        retry once. Zero cost on the happy path (no per-segment
        existence probes — the failed read is the probe)."""
        fs = self.collection.fs
        seg_prefix = self.collection.seg_prefix
        # per-path listing tasks dominate many-segment scans at the
        # Spark default (10000 == one task per path); batch them for
        # the DURATION OF THE LISTING only (file-index construction
        # happens inside spark.read.parquet), then restore — a
        # session-wide override would leak into every later parquet
        # scan on user-supplied sessions, including non-lakota ones
        # (ADVICE r6). Only the untouched default is overridden — an
        # explicit user setting (session.py sets 64 for engine-built
        # sessions) wins.
        key = "spark.sql.sources.parallelPartitionDiscovery.parallelism"
        override = (
            len(paths) > 32 and self.spark.conf.get(key, "10000") == "10000"
        )
        if override:
            self.spark.conf.set(key, "64")
        try:
            try:
                return self.spark.read.parquet(
                    *fs.spark_read_uris(
                        [f"{seg_prefix}/{p}" for p in paths]
                    )
                )
            except Exception:
                self._resurrect_missing(paths)
                return self.spark.read.parquet(
                    *fs.spark_read_uris(
                        [f"{seg_prefix}/{p}" for p in paths]
                    )
                )
        finally:
            if override:
                self.spark.conf.unset(key)

    def _read_segments(
        self, segs: list[Segment], range_pred=None, kv: bool | None = None
    ) -> DataFrame:
        # `kv` = does this read need `_seg_seq` for last-writer-wins?
        # Defaults to the schema flag; frame() passes False for a
        # pairwise-disjoint KV set, which routes the read through the
        # join-free clean path below (raw parquet scan, no seq column,
        # no broadcast bounds-join)
        kv = self.schema.kv if kv is None else kv
        live = [s for s in segs if s.path]
        if not live:
            out = self.spark.createDataFrame(
                [], self.schema.struct_type()
            )
            if kv:
                # `_kv_dedup` windows on `_seg_seq` unconditionally —
                # the empty relation must carry it too (reachable since
                # r13's shadowing-aware pruning can empty the segment
                # list, and for an empty KV series before that)
                out = out.withColumn("_seg_seq", F.lit(0).cast("long"))
            return out
        # Join-free fast path: a segment never clipped by an overlay (no
        # "clip" marker) has effective bounds ⊇ its file's rows — the
        # per-row in_seg test is vacuously true, so its files scan
        # directly (predicates push down to parquet, no join in the
        # plan). Only clipped pieces — and KV reads, which need
        # `_seg_seq` for last-writer-wins — pay the broadcast
        # bounds-join. Append-only and post-defrag series read at raw
        # parquet-scan speed.
        clean = [] if kv else [s for s in live if not s.meta.get("clip")]
        dirty = live if kv else [s for s in live if s.meta.get("clip")]
        parts = []
        if clean:
            df = self._read_paths(sorted({s.path for s in clean}))
            if range_pred is not None:
                df = range_pred(df)
            parts.append(df.withColumn("_seg_seq", F.lit(0).cast("long")))
        if dirty:
            df = self._read_paths(sorted({s.path for s in dirty}))
            if range_pred is not None:
                df = range_pred(df)  # before input_file_name: stays pushable
            bounds = self.collection.bounds_df(dirty)
            seg_key = F.element_at(F.split(F.input_file_name(), "/"), -2)
            idx = self._idx_struct()
            in_seg = (
                (idx > F.col("_seg_start"))
                | (F.col("_seg_start_closed") & (idx == F.col("_seg_start")))
            ) & (
                (idx < F.col("_seg_stop"))
                | (F.col("_seg_stop_closed") & (idx == F.col("_seg_stop")))
            )
            parts.append(
                df.withColumn("_seg_key", seg_key)
                .join(F.broadcast(bounds), on="_seg_key")
                .where(in_seg)
                .drop(
                    "_seg_key",
                    "_seg_start",
                    "_seg_stop",
                    "_seg_start_closed",
                    "_seg_stop_closed",
                    "_seg_label",
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _ordered_scan(
        self,
        segs: list[Segment],
        start_b,
        stop_b,
        start_closed: bool,
        stop_closed: bool,
        cols: list[str],
        mask_plan=None,
        mask_cols: tuple[str, ...] = (),
        kv_ok: bool = False,
    ) -> DataFrame | None:
        """Exchange-free SORTED distributed read (VERDICT r8 #2).

        A native parquet scan cannot report ordering to Catalyst from
        Python (file splits are bin-packed by size, losing file order),
        so ``frame(sort=True)`` historically paid a full range-exchange
        Sort that is pure overhead: clean segments are pairwise disjoint,
        interval-ordered in the snapshot, and internally sorted (the
        write path range-partitions + sorts, `_files_stats` relies on
        it). This scan exploits that: the ordered part-file list is
        packed into interval-contiguous partitions of a `mapInArrow`
        relation, each partition reads its files with pyarrow IN ORDER,
        and partition order == global sort order — so collect / limit /
        offset / toPandas see sorted rows with ZERO Exchange or Sort
        nodes in the plan (`tests/test_plans.py` pins this). Pushdown is
        preserved by hand: coarse leading-index filters go to
        ``pq.read_table(filters=)`` (row-group pruning), the exact
        lexicographic prefix bound applies arrow-side, and only
        ``cols ∪ idx`` columns are read.

        Scale shape: one task per ~2×parallelism chunk of files, bytes
        never touch the driver, reads are C++ parquet on the executors.
        Returns None when the scan shape disqualifies — KV needing
        last-writer-wins dedup (``kv_ok=True`` means the caller proved
        the queried set pairwise-disjoint, so dedup is a no-op and the
        scan applies; the KV snapshot keeps commit order, so sort by
        start to restore interval order), clipped segments (need the
        bounds join), or a backend that resolves to neither a
        pyarrow-readable root nor a local read-through cache — and the
        classic scan + orderBy path applies."""
        if self.schema.kv and not kv_ok:
            return None
        live = [s for s in segs if s.path]
        if not live or any(s.meta.get("clip") for s in live):
            return None
        if self.schema.kv:
            live = sorted(live, key=lambda s: tuple(s.start))
        rels = [
            f"{self.collection.seg_prefix}/{s.path}" for s in live
        ]
        if len(set(rels)) != len(rels):
            return None  # one file under two pieces ⇒ effectively clipped
        fs = self.collection.fs
        if getattr(fs, "arrow_readable", False):
            base = fs  # executors reopen pafs.FileSystem.from_uri(fs.uri)
            materialize = None
        elif hasattr(fs, "cache"):

            def materialize():
                fs.spark_read_uris(rels)  # fetch through the read cache

            materialize()
            base = fs.cache
        else:
            return None

        def list_parts():
            files = []
            for rel in rels:  # interval order == global sort order
                names = sorted(
                    n for n in base.ls(rel) if n.endswith(".parquet")
                )
                if not names:
                    return None
                files.extend(f"{rel}/{n}" for n in names)
            return files

        try:
            files = list_parts()
        except OSError:
            files = None
        if files is None:
            # GC bury race: resurrect referenced-but-buried segments and
            # retry once (same self-heal as `_read_paths`)
            self._resurrect_missing([s.path for s in live])
            if materialize is not None:
                materialize()
            try:
                files = list_parts()
            except OSError:
                return None
            if files is None:
                return None
        idx = list(self.schema.idx)
        need_mask = start_b is not None or stop_b is not None
        read_cols = list(
            dict.fromkeys(
                [*cols, *(idx if need_mask else []), *mask_cols]
            )
        )
        # coarse row-group pruning on the leading index column — the
        # same shape `_bound_pred` pushes to a native scan
        filters = []
        if start_b is not None:
            op = ">=" if (start_closed or len(start_b) > 1) else ">"
            filters.append((idx[0], op, start_b[0]))
        if stop_b is not None:
            op = "<=" if (stop_closed or len(stop_b) > 1) else "<"
            filters.append((idx[0], op, stop_b[0]))
        from pyspark.sql.types import StructType

        fields = {f.name: f for f in self.schema.struct_type().fields}
        out_struct = StructType([fields[c] for c in cols])
        read_struct = StructType([fields[c] for c in read_cols])
        reader = _ordered_reader(
            base.uri,
            read_struct,
            cols,
            filters,
            (idx, start_b, start_closed, stop_b, stop_closed)
            if need_mask
            else None,
            mask_plan=mask_plan,
        )
        try:
            # classic: parallelize slices the file list WITHOUT an
            # exchange — each task opens its own segment files
            sc = self.spark.sparkContext
            n_parts = max(1, min(len(files), sc.defaultParallelism * 2))
            rdd = sc.parallelize([(f,) for f in files], n_parts)
            fdf = self.spark.createDataFrame(rdd, "rel string")
        except Exception:  # noqa: BLE001 — Connect: no RDD surface; a
            # local relation + round-robin repartition spreads the file
            # list instead (one tiny exchange over pathnames, not data)
            n_parts = max(
                1,
                min(
                    len(files),
                    int(
                        self.spark.conf.get("spark.sql.shuffle.partitions")
                    ),
                ),
            )
            fdf = self.spark.createDataFrame(
                [(f,) for f in files], "rel string"
            ).repartition(n_parts)
        return fdf.mapInArrow(reader, out_struct)

    def _apply_range(
        self, df: DataFrame, start, stop, start_closed: bool, stop_closed: bool
    ) -> DataFrame:
        """Query-interval predicate with closed-bound semantics (P5/P6).
        Prefix bounds constrain only the leading index columns
        (`lakota/series.py:12-20`).

        Pushdown shape matters: a STRUCT comparison never reaches the
        parquet scan, so single-column bounds emit plain column predicates
        (fully pushable → row-group/page skipping), and multi-column
        bounds add a pushable coarse predicate on the leading column plus
        the exact lexicographic struct compare as a post-filter.
        """
        idx = self.schema.idx
        if start is not None:
            df = df.where(
                self._bound_pred(start, start_closed, is_start=True)
            )
        if stop is not None:
            df = df.where(self._bound_pred(stop, stop_closed, is_start=False))
        return df

    def _bound_pred(self, bound, closed: bool, is_start: bool):
        idx = self.schema.idx
        k = len(bound)
        if k == 1:
            c = F.col(idx[0])
            v = F.lit(bound[0])
            if is_start:
                return (c >= v) if closed else (c > v)
            return (c <= v) if closed else (c < v)
        s = F.struct(*[F.col(c) for c in idx[:k]])
        lit = F.struct(*[F.lit(v).alias(c) for c, v in zip(idx[:k], bound)])
        exact = (s > lit) if is_start else (s < lit)
        if closed:
            exact = exact | (s == lit)
        # coarse leading-column predicate: pushable to the parquet scan
        lead = F.col(idx[0])
        coarse = (lead >= F.lit(bound[0])) if is_start else (
            lead <= F.lit(bound[0])
        )
        return coarse & exact

    def _kv_dedup(self, df: DataFrame) -> DataFrame:
        """Last-writer-wins by key: later commits (higher seq) shadow
        earlier rows of the same key (`lakota/series.py:449-475`)."""
        w = Window.partitionBy(
            *[F.col(c) for c in self.schema.idx]
        ).orderBy(F.col("_seg_seq").desc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    # ------------------------------------------------------------- extras

    def tail(
        self,
        length: int,
        start=None,
        stop=None,
        before=None,
        closed: str = "b",
        limit: int | None = None,
        offset: int | None = None,
        select: list[str] | None = None,
    ) -> DataFrame:
        """Last N rows (`lakota/series.py:261-312`): prune to the trailing
        segments whose lengths cover N (metadata), then TakeOrdered.
        ``start``/``stop`` pre-filter the range the tail draws from;
        ``limit``/``offset`` slice the resulting tail frame from its
        start (reference `tests/series_test.py:715-717`); ``select``
        projects columns.

        ``seg.length`` is the PHYSICAL row count — an upper bound on the
        effective rows once overlays/deletes narrowed a segment's bounds
        (the reference counts materialized frames per segment). The
        optimistic prune is therefore verified with a cheap count on the
        pruned set; if it came up short, the kept suffix is widened
        (doubling) until ``length`` rows are covered or every segment is
        in — at most O(log S) extra metadata passes, data read stays
        bounded by the suffix actually needed."""
        if start is not None or stop is not None:
            # pre-filtered tail: draw from the range-filtered read (the
            # reference walks the same filtered segment list)
            df = self.frame(
                start=start, stop=stop, before=before, closed=closed,
                sort=False,
            )
        else:
            snap = self.collection.snapshot(before=before)
            segs = snap.for_label(self.label)
            kv_dedup = self.schema.kv
            if kv_dedup:
                from lakota_spark import zonemap

                if zonemap.pairwise_disjoint(
                    [s for s in segs if s.path]
                ):
                    # disjoint KV (round 13): dedup is a no-op, so the
                    # non-KV trailing-segment metadata prune applies —
                    # after re-sorting the commit-ordered snapshot list
                    # to interval order (the tail = the last intervals)
                    segs = sorted(segs, key=lambda s: tuple(s.start))
                    kv_dedup = False
            k = 0
            total = 0
            for seg in reversed(segs):
                k += 1
                total += seg.length
                if total >= length and not kv_dedup:
                    break
            if kv_dedup:
                k = len(segs)  # overlapping KV needs every segment for
                # last-writer-wins
            while True:
                df = self._read_segments(
                    segs[len(segs) - k :], kv=kv_dedup
                )
                if kv_dedup:
                    df = self._kv_dedup(df)
                if k >= len(segs):
                    break
                if df.limit(length).count() >= length:
                    break
                k = min(len(segs), max(k * 2, k + 1))
        idx_desc = [F.col(c).desc() for c in self.schema.idx]
        tail = df.orderBy(*idx_desc).limit(length)
        out = tail.orderBy(*[F.col(c) for c in self.schema.idx])
        if (limit, offset) != (None, None):
            # reference slice semantics: rows [offset, offset+limit) of
            # the tail frame; offset without limit yields nothing
            off = offset or 0
            if off:
                out = out.offset(off)
            out = out.limit(limit or 0)
        return out.select(*(select or list(self.schema.columns)))

    def paginate(self, step: int, **frame_kwargs):
        """Pull-based chunk stream (`lakota/series.py:237-259`): yields
        DataFrames of ``step`` rows in index order.

        One sort + one global-index pass (see operators/index.py), then
        each page is a cheap range filter over the persisted indexed data
        — not a re-sort per page (the limit/offset formulation is
        O(pages × sort))."""
        from lakota_spark.operators.index import (
            release_index,
            with_global_index,
        )

        if step <= 0:
            raise ValueError("step must be positive")
        frame_kwargs.setdefault("sort", False)
        # ordering needs the index columns — apply any projection per page
        select = frame_kwargs.pop("select", None) or list(self.schema.columns)
        base = self.frame(**frame_kwargs)
        indexed = with_global_index(base, list(self.schema.idx))
        try:
            total = indexed.count()
            for offset in range(0, total, step):
                yield (
                    indexed.where(
                        (F.col("_rn") >= offset)
                        & (F.col("_rn") < offset + step)
                    )
                    .orderBy("_rn")
                    .select(*select)
                )
        finally:
            release_index(indexed)

    def update(self, data, start=None, stop=None):
        """Partial column update aligned on index, zero-filling untouched
        columns on extensions (`lakota/series.py:159-190`, F8)."""
        from lakota_spark.operators.kv import update_zerofill

        # lenient coercion: an update frame carries the index plus a SUBSET
        # of value columns — cast only what is present
        pdf = None
        if not isinstance(data, DataFrame):
            import pandas as pd

            pdf = pd.DataFrame(dict(data))
            data = self.spark.createDataFrame(pdf)
        types = self.schema.struct_type()
        upd = data.select(
            *[
                F.col(c).cast(types[c].dataType).alias(c)
                for c in data.columns
                if c in self.schema.columns
            ]
        )
        missing_idx = [c for c in self.schema.idx if c not in upd.columns]
        if missing_idx:
            raise ValueError(f"update frame missing index columns {missing_idx}")
        update_cols = [c for c in self.schema.values if c in upd.columns]
        local = self._local_stats(pdf) if pdf is not None else None
        if local is not None and local[0] > 0:
            _, lo, hi = local
            lo, hi = tuple(lo), tuple(hi)
        else:
            stats = upd.agg(
                F.min(self._idx_struct()).alias("lo"),
                F.max(self._idx_struct()).alias("hi"),
            ).collect()[0]
            lo, hi = tuple(stats["lo"]), tuple(stats["hi"])
        # sort=False: update_zerofill joins on the index and write()
        # range-partitions + sorts anyway — row order here is irrelevant
        base = self.frame(start=lo, stop=hi, sort=False)
        upd_proj = upd.select(*self.schema.idx, *update_cols)
        merged = update_zerofill(
            base, upd_proj, keys=list(self.schema.idx), update_cols=update_cols
        )
        return self.write(merged.select(*self.schema.columns))

    def delete(self, start, stop, closed: str = "b", root: bool = False):
        """Range delete = empty overlay (`lakota/series.py:227-229`);
        ``root=True`` commits the tombstone as a new root (total reset)."""
        start = self.schema.coerce_bound(start)
        stop = self.schema.coerce_bound(stop)
        sc, ec = CLOSED[closed]
        return self._commit_segment(
            Segment(
                label=self.label,
                start=start,
                stop=stop,
                start_closed=sc,
                stop_closed=ec,
                path=None,
                length=0,
            ),
            root=root,
        )

    def records(self, map_dtype: str | None = "default", **frame_kwargs):
        """Row-dict iterator (`Frame.records`, `lakota/frame.py:261-269`).
        Streams via toLocalIterator — never materializes the series on the
        driver.

        ``map_dtype`` mirrors the reference's styles
        (`lakota/schema.py:25-38`): ``"default"`` yields native
        datetime/date objects (Spark's natural row types), ``"epoch"``
        converts timestamp→epoch seconds and date→epoch-day seconds,
        ``None`` leaves values untouched.
        """
        import datetime as dtm

        def to_epoch(v):
            if isinstance(v, dtm.datetime):
                return int(v.replace(tzinfo=dtm.timezone.utc).timestamp())
            if isinstance(v, dtm.date):
                return (v - dtm.date(1970, 1, 1)).days * 86400
            return v

        for row in self.frame(**frame_kwargs).toLocalIterator():
            rec = row.asDict()
            if map_dtype == "epoch":
                rec = {k: to_epoch(v) for k, v in rec.items()}
            yield rec

    def period(self) -> float | None:
        """Average tick period in seconds, metadata + two-row read
        (`Series.period`, `lakota/series.py:56-65`) — used to pick
        partition granularity, not a query op."""
        segs = self.collection.snapshot().for_label(self.label)
        total = sum(s.length for s in segs)
        if total < 2 or not segs:
            return None
        lo, hi = segs[0].start[0], segs[-1].stop[0]
        import datetime as dt

        if isinstance(lo, dt.datetime):
            span = (hi - lo).total_seconds()
        elif isinstance(lo, dt.date):
            span = (hi - lo).days * 86400.0
        elif isinstance(lo, (int, float)):
            span = float(hi - lo)
        else:
            return None
        return span / max(total - 1, 1)

    def interval(self, target_rows: int = PAGE_LEN) -> float | None:
        """Suggested bucket width (seconds) holding ~target_rows rows
        (`Series.interval`, `lakota/series.py:67-80`)."""
        p = self.period()
        return None if p is None else p * target_rows

    def interval_unit(self, target_rows: int = PAGE_LEN) -> str | None:
        """Smallest natural time partition ('m'/'h'/'D'/'W'/'M'/'Y', None
        when even a year is too small) fitting ~target_rows rows — the
        reference's `Interval.bisect` (`lakota/utils.py:289-304`), usable
        directly as a `floor`/`paginate` unit."""
        secs = self.interval(target_rows)
        if secs is None:
            return None
        units = [("m", 60), ("h", 3600), ("D", 86_400), ("W", 604_800),
                 ("M", 2_592_000), ("Y", 31_536_000)]
        for label, dur in units:
            if secs < dur:
                return label
        return None

    def __len__(self) -> int:
        """Spark count over effective bounds (exact under overlays)."""
        return self.frame(sort=False).count()

    def __getitem__(self, key) -> "SeriesSlice":
        """Quickstart slice syntax (`lakota/__init__.py` front page):
        ``series[:'2020-01-03'].df()`` — bounds are closed on both ends
        like the reference's default."""
        if not isinstance(key, slice):
            raise TypeError("Series supports slice indexing only")
        if key.step is not None:
            raise ValueError("Series slices take no step")
        return SeriesSlice(self, key.start, key.stop)

    def __bool__(self) -> bool:
        """True when the series has any committed segment — metadata only,
        no Spark job (`tests/series_test.py:721-724`: `bool(clc / label)`
        is False for an unknown label)."""
        return self.meta_len() > 0

    def meta_len(self) -> int:
        """O(1) metadata count — exact when no overlay truncation occurred
        (`lakota/series.py:231-232`)."""
        return self.collection.snapshot().length(self.label)


class SeriesSlice:
    """A range-bound view of a series: every read method forwards with
    the slice's start/stop pre-applied (reference quickstart
    ``series[:'2020-01-03'].df()``)."""

    def __init__(self, series: Series, start, stop):
        self.series = series
        self.start = start
        self.stop = stop

    def frame(self, **kwargs) -> DataFrame:
        return self.series.frame(start=self.start, stop=self.stop, **kwargs)

    def df(self, **kwargs):
        return self.series.df(start=self.start, stop=self.stop, **kwargs)

    def __len__(self) -> int:
        return self.frame(sort=False).count()


class KVSeries(Series):
    """Upsert-on-index series (`lakota/series.py:449-503`). The collection
    schema's ``kv`` flag drives behavior; this subclass only adds the
    key-delete helper."""

    def delete_keys(self, keys_df) -> None:
        """Delete specific keys by overlaying tombstones: rewrite the
        complement of the keys within their span
        (`lakota/series.py:477-503`)."""
        keys = self._coerce_keys(keys_df)
        current = self.frame()
        remaining = current.join(
            keys, on=list(self.schema.idx), how="left_anti"
        )
        self._rewrite_full_span(remaining)

    def compact(self) -> None:
        """Rewrite the RESOLVED rows as one full-span segment that
        shadows all history (round 13) — the one-call path from an
        overlapping KV layout to the pairwise-disjoint shape every fast
        read needs: after compact(), frame()/df()/tail() skip the dedup
        window, and `spark.read.format("lakota")` serves the table
        (its scan-time refusal names this as the remedy). History stays
        time-travellable (`before=` the compaction sees the old
        layout); defrag cannot do this — it must SKIP order-entangled
        runs (see `Collection.defrag`), while a full-span resolved
        rewrite is the one layout change for which a single fresh seq
        is always sound."""
        self._rewrite_full_span(self.frame())

    def _rewrite_full_span(self, df: DataFrame) -> None:
        """Commit ``df`` as ONE segment spanning the label's whole
        interval, shadowing every older segment (the shared tail of
        `delete_keys` / `compact`).

        Span bounds come from segment METADATA (no full-frame Spark
        job): the union of segment intervals covers every live row by
        definition, and the overlay may only be wider than the data.
        The leaf is captured for optimistic commit — a racing write
        forks rather than vanishing from the rewritten head."""
        leaf, snap = self.collection.leaf_and_snapshot()
        segs = snap.for_label(self.label)
        if not segs:
            return
        lo = min(tuple(s.start) for s in segs)
        hi = max(tuple(s.stop) for s in segs)
        seq = snap.max_seq + 1
        n = df.count()
        if n == 0:
            self._commit_segment(
                Segment(self.label, lo, hi, True, True, None, 0)
            )
            return
        path, digest = self._write_segment_files(df, n)
        seg = Segment(
            self.label, lo, hi, True, True, path, n, seq, {"digest": digest}
        )
        # force non-KV overlay so older key versions are shadowed; the
        # KV table holds OVERLAPPING segments, so the windowed fast path
        # must widen to the whole label block
        new_snap = snap.overlay(seg, kv=False, overlapping=True)
        self.collection.commit_snapshot(
            new_snap, parents=[leaf.child] if leaf else None
        )

    def _coerce_keys(self, keys) -> DataFrame:
        if isinstance(keys, DataFrame):
            return keys.select(*self.schema.idx)
        import pandas as pd

        pdf = pd.DataFrame(keys)
        return self.spark.createDataFrame(
            pdf, schema=self.schema.index_struct_type()
        ).select(*self.schema.idx)

