"""Fuzzy-string blocking join (edit-distance ≤ 1) — the entity-linking
primitive the north star names alongside MinHash: collapse near-identical
SURFACE FORMS (typos, single-char variants) into candidate merge pairs.

Blocking is the SymSpell deletion-neighborhood scheme (Garbe's symmetric
delete algorithm, public): every form emits itself plus each single-deletion
variant as block keys.  Two strings within edit distance 1 ALWAYS share a
key (substitution at i → both share s−i; insert/delete → the shorter string
itself is a deletion variant of the longer), so blocking loses nothing, and
verification runs only inside blocks — never all-pairs over the vocabulary.

Scale shape: the join runs over DISTINCT forms (vocabulary-sized — entity
linking always canonicalizes forms, not instances), keys are a bounded
per-form fan-out (len+1), and each block is a keyed group.  A degenerate
key (thousands of forms one deletion apart) is guarded like the other
quadratic-in-block dedup paths (``max_block_rows`` raise with guidance).

Reference anchor: the reference's canonicalization dedupes exact surface
forms only (src/knowledge_graph/kg_builder.py drop_duplicates); fuzzy
merging is part of this engine's extension surface per the north star.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Max


def _within_one(a: str, b: str) -> bool:
    """Exact edit-distance ≤ 1 check for DISTINCT strings — mirrors
    ``levenshtein(a, b) <= 1`` (two-pointer; no DP table needed at d≤1)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b is a plus one inserted char: skip the first mismatch in b
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def _deletion_keys(s: str) -> list[str]:
    return [s] + [s[:i] + s[i + 1:] for i in range(len(s))]


def fuzzy_form_pairs(ds, *, col: str, max_block_rows: int = 10_000):
    """All pairs of distinct values of ``col`` within edit distance 1,
    with each form's instance count.  Returns a Dataset with columns
    (name_a, name_b, dist, n_a, n_b), name_a < name_b."""
    from ray.data.aggregate import Count

    forms = (ds.select_columns([col])
             .groupby(col).aggregate(Count(alias_name="n"))
             .map_batches(lambda b: b, batch_format="pyarrow"))

    def explode_keys(b: pa.Table) -> pa.Table:
        names = b[col].to_pylist()
        ns = b["n"].to_pylist()
        out_k, out_s, out_n = [], [], []
        for s, n in zip(names, ns):
            s = s or ""
            for k in _deletion_keys(s):
                out_k.append(k)
                out_s.append(s)
                out_n.append(n)
        return pa.table({"key": pa.array(out_k, pa.string()),
                         "form": pa.array(out_s, pa.string()),
                         "n": pa.array(out_n, pa.int64())})

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > max_block_rows:
            raise ValueError(
                f"fuzzy block for key {g['key'].iloc[0]!r} has {len(g)} "
                f"forms (> {max_block_rows}); a degenerate deletion "
                f"neighborhood concentrates quadratic verification on one "
                f"worker — raise max_block_rows only with profiling, or "
                f"pre-split the block by a second char-ngram key")
        forms_ = g["form"].tolist()
        ns = g["n"].tolist()
        seen = sorted(set(zip(forms_, ns)))
        out = {"name_a": [], "name_b": [], "n_a": [], "n_b": []}
        for i in range(len(seen)):
            for j in range(i + 1, len(seen)):
                a, na = seen[i]
                b, nb = seen[j]
                if _within_one(a, b):
                    out["name_a"].append(a)
                    out["name_b"].append(b)
                    out["n_a"].append(na)
                    out["n_b"].append(nb)
        return pd.DataFrame(out, dtype=object) if out["name_a"] else \
            pd.DataFrame({"name_a": pd.Series([], dtype="object"),
                          "name_b": pd.Series([], dtype="object"),
                          "n_a": pd.Series([], dtype="int64"),
                          "n_b": pd.Series([], dtype="int64")})

    pairs = (forms.map_batches(explode_keys, batch_format="pyarrow")
             .groupby("key").map_groups(block_pairs, batch_format="pandas")
             .map_batches(lambda b: pa.table({
                 "name_a": b["name_a"].cast(pa.string()),
                 "name_b": b["name_b"].cast(pa.string()),
                 "n_a": b["n_a"].cast(pa.int64()),
                 "n_b": b["n_b"].cast(pa.int64())}),
                 batch_format="pyarrow"))

    # a pair can surface from several shared deletion keys → dedup with a
    # native Max fold (values identical across duplicates)
    out = (pairs.groupby(["name_a", "name_b"])
           .aggregate(Max("n_a", alias_name="n_a"),
                      Max("n_b", alias_name="n_b")))
    return out.map_batches(
        lambda b: b.append_column(
            "dist", pa.array(np.ones(b.num_rows, np.int64))),
        batch_format="pyarrow")
