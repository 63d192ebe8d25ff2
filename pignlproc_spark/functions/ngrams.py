"""Restricted n-gram generation against a broadcast surface-form dict.

Reference parity: ``pignlproc/helpers/RestrictedNGramGenerator.java``
(SURVEY.md §2.1 J12, reconstructed): emit every n-gram (n ≤ k) of the
article text that is a member of a known surface-form dictionary — the
*denominator* of link probability (total occurrences of each surface
form, linked or not). The reference loads the dict from a side file
into an in-memory set per task; we broadcast it
(BASELINE.json:6 "broadcast surface-form→URI dictionaries").

Matching spec (FROZEN): text is tokenized with the engine tokenizer
WITHOUT stopword removal (surface forms may contain stopwords);
candidate n-grams are token windows of length 1..max_n joined with a
single space; membership is tested against the lowercased
space-joined token form of each dictionary surface form. Emission is
per-occurrence (multiset).

Scale note: at 10^12 documents the dict (~10^7–10^8 surface forms)
lives once per executor via Spark broadcast; membership is O(1) set
lookups over token windows — no shuffle at all in this stage. A
Python ``set`` of 10M strings is ~1–2 GB; for bigger dicts swap in the
first-token-index prefilter below (already implemented) or an
Aho-Corasick automaton behind the same function signature.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Iterable

import pandas as pd

from pignlproc_spark.functions.tokenize import tokenize


def normalize_sf(sf: str) -> str:
    """Dictionary-side normalization: lowercase space-joined tokens."""
    return " ".join(tokenize(sf, stopwords=None))


class SurfaceFormMatcher:
    """First-token-indexed n-gram matcher (broadcast payload).

    ``index`` maps first token → set of n-gram lengths present with
    that first token; membership confirmed against the full set. This
    prunes the O(k) window scan to tokens that can start a match.
    """

    def __init__(self, surface_forms: Iterable[str], max_n: int = 4):
        self.max_n = max_n
        self.forms: set[str] = set()
        self.index: dict[str, list[int]] = {}
        lengths = defaultdict(set)
        for sf in surface_forms:
            norm = normalize_sf(sf)
            if not norm:
                continue
            toks = norm.split(" ")
            if len(toks) > max_n:
                continue
            self.forms.add(norm)
            lengths[toks[0]].add(len(toks))
        self.index = {t: sorted(ls) for t, ls in lengths.items()}

    @classmethod
    def from_normalized(cls, norms: Iterable[str], max_n: int = 4) -> "SurfaceFormMatcher":
        """Build from ALREADY-normalized forms (``normalize_sf`` output,
        e.g. computed distributed via ``stats.normalize_sf_udf``) —
        skips the per-form tokenize, which matters when the build runs
        lazily per executor over a 10M-entry Arrow payload."""
        m = cls.__new__(cls)
        m.max_n = max_n
        m.forms = set()
        lengths = defaultdict(set)
        for norm in norms:
            if not norm:
                continue
            toks = norm.split(" ")
            if len(toks) > max_n:
                continue
            m.forms.add(norm)
            lengths[toks[0]].add(len(toks))
        m.index = {t: sorted(ls) for t, ls in lengths.items()}
        return m

    def occurrences(self, text: str | None) -> list[str]:
        """All dictionary n-gram occurrences in text (multiset)."""
        if not text:
            return []
        toks = tokenize(text, stopwords=None)
        out: list[str] = []
        n_toks = len(toks)
        for i, t in enumerate(toks):
            ls = self.index.get(t)
            if not ls:
                continue
            for n in ls:
                if i + n > n_toks:
                    break
                cand = " ".join(toks[i : i + n]) if n > 1 else t
                if cand in self.forms:
                    out.append(cand)
        return out


def occurrences_udf(spark, surface_forms: list[str], max_n: int = 4):
    """pandas UDF text → ARRAY<STRING> of dictionary occurrences.

    The matcher is built once on the driver and shipped via Spark
    broadcast; each Arrow batch does pure in-memory set lookups.
    Small/test-path convenience — the pipeline ships the capped
    dictionary as an Arrow buffer instead (:func:`occurrences_udf_arrow`;
    a 10M-string Python list costs GBs of driver heap + pickle time).
    """
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(SurfaceFormMatcher(surface_forms, max_n))

    @pandas_udf("array<string>")
    def _occ(text: pd.Series) -> pd.Series:
        matcher = bc.value
        return pd.Series([matcher.occurrences(t) for t in text])

    return _occ


class _LazyArrowMatcher:
    """Broadcast payload for the Arrow dictionary path: holds the
    normalized forms as serialized Arrow IPC bytes (contiguous buffers
    — no per-string Python objects on the driver, compact pickle) and
    materializes the executor-local :class:`SurfaceFormMatcher` ONCE,
    lazily, on first use. The per-executor set is inherent to O(1)
    window matching (the reference's side-file dict does the same);
    the fix is that the DRIVER never holds 10M Python strings."""

    def __init__(self, ipc_bytes: bytes, max_n: int):
        self.ipc_bytes = ipc_bytes
        self.max_n = max_n
        self._matcher: SurfaceFormMatcher | None = None

    def __getstate__(self):
        return (self.ipc_bytes, self.max_n)  # never pickle the built matcher

    def __setstate__(self, state):
        self.ipc_bytes, self.max_n = state
        self._matcher = None

    def get(self) -> SurfaceFormMatcher:
        if self._matcher is None:
            import pyarrow as pa

            tbl = pa.ipc.open_stream(self.ipc_bytes).read_all()
            self._matcher = SurfaceFormMatcher.from_normalized(
                (v.as_py() for chunk in tbl.column(0).chunks for v in chunk),
                self.max_n,
            )
        return self._matcher


def normalized_forms_ipc(forms_df) -> bytes:
    """One NORMALIZED single-column DataFrame → Arrow IPC bytes. The
    collect lands in Arrow buffers (``DataFrame.toArrow``), not Python
    objects — the driver-side footprint is the string bytes themselves.
    """
    import pyarrow as pa

    tbl = forms_df.toArrow()
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return sink.getvalue().to_pybytes()


def occurrences_udf_arrow(spark, normalized_ipc: bytes, max_n: int = 4):
    """pandas UDF text → ARRAY<STRING>, dictionary shipped as Arrow
    IPC bytes of ALREADY-normalized forms (see
    ``stats.capped_surface_forms_ipc``). The matcher builds lazily per
    executor — the driver pickles only the compact buffer."""
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(_LazyArrowMatcher(normalized_ipc, max_n))

    @pandas_udf("array<string>")
    def _occ(text: pd.Series) -> pd.Series:
        matcher = bc.value.get()
        return pd.Series([matcher.occurrences(t) for t in text])

    return _occ
