"""End-to-end training-data curation pipeline — the composition the
operator library exists for:

    clean/normalize -> quality gates -> exact dedup (keep-first)
    -> deterministic train/val/test split

One streaming Dataset chain: the clean + quality stage is a single
``map_batches`` kernel (no intermediate stream), dedup is the one
fp-hash shuffle of ``exact_dedup_keep_first``, the split is a
stateless map. Nothing corpus-sized touches the driver; every rule is
a pure function of the row, so the whole pipeline is reproducible in
SQL (see the ``curation_pipeline`` oracle in ``__ray_entry__.py``).

Quality gates (Gopher-flavored, integer arithmetic only so the oracle
compares exactly):
  * at least ``min_tokens`` whitespace tokens after cleaning;
  * bigram repetition: distinct-bigrams * 2 >= total-bigrams
    (drops highly repetitive documents).
"""

from __future__ import annotations

import hashlib
import re
import unicodedata

import pandas as pd
import pyarrow as pa
import ray.data as rd

from .ops.relational import _resolve_partitions

_WS = re.compile(r"\s+")
_CTRL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")


def curate(docs: rd.Dataset, min_tokens: int = 5,
           num_partitions: "int | None" = None) -> rd.Dataset:
    """(doc_id, split, n_tokens) for every surviving document."""
    num_partitions = _resolve_partitions(num_partitions)
    from .ops.sampling import hash_split

    def clean_and_gate(t: pa.Table) -> pa.Table:
        ids, fps, ntok = [], [], []
        for doc_id, x in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            s = unicodedata.normalize("NFC", x or "").lower()
            s = _WS.sub(" ", _CTRL.sub("", s)).strip()
            toks = s.split(" ")
            if len(toks) < min_tokens:
                continue
            bigrams = [toks[i] + " " + toks[i + 1]
                       for i in range(len(toks) - 1)]
            if len(set(bigrams)) * 2 < len(bigrams):
                continue
            ids.append(doc_id)
            fps.append(hashlib.md5(s.encode()).hexdigest())
            ntok.append(len(toks))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "fp": pa.array(fps, pa.string()),
                         "n_tokens": pa.array(ntok, pa.int64())})

    gated = docs.map_batches(clean_and_gate, batch_format="pyarrow")

    # exact dedup keep-first on the CLEANED fingerprint: batch-local
    # combiner, one fp-hash shuffle, in-partition keep-min-doc_id
    # (same plan as ops.dedup.exact_dedup_keep_first, inlined here
    # because the fp is already computed)
    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="stable").drop_duplicates("fp")
        df = df.assign(_part=(pd.util.hash_pandas_object(df["fp"], index=False)
                              % num_partitions).astype("int64"))
        return df

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable").drop_duplicates("fp")
        return g.drop(columns=["fp", "_part"])

    deduped = (gated.map_batches(add_part, batch_format="pandas")
               .groupby("_part").map_groups(keep_first,
                                            batch_format="pandas"))

    return hash_split(deduped, "doc_id").select_columns(
        ["doc_id", "split", "n_tokens"])
