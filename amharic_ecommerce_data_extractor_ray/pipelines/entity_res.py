"""End-to-end entity resolution (round 3, batch 8).

Composes the engine's blocking join and graph clustering into the full
canonicalization step the north star describes ("entity linking and
canonicalization use fuzzy-string blocking plus groupby-aggregate merges to
collapse surface forms into canonical nodes"): surface forms → SymSpell
deletion-neighborhood fuzzy pairs (edit distance ≤ 1) → distributed
connected components → one canonical representative per cluster (highest
instance count, ties to the lexicographically smallest form) → the full
form→canonical resolution table.

Reference analog: the reference collapses entity surface forms only by
exact string match (notebook 03's groupby); this is the fuzzy superset,
oracle-gated end to end (one SQL statement recomputes the whole chain:
levenshtein pairs → recursive-CTE components → argmax canonical).

Scale notes: every table in flight is VOCABULARY-sized (distinct surface
forms), never corpus-sized.  Form ids are 63-bit md5 hashes
(``md5_number_lower >> 1`` — int64-safe, identical in SQL), so components
run on integers with exact-sum convergence witnesses.  Self-pairs are
added for every form so singleton forms flow through the same component
labeling (no left-join special case); joins are the hardened reduce-side
``hash_lookup_join``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..stages.dedup import _stable_u64, connected_components
from ..stages.fuzzy import fuzzy_form_pairs
from ..stages.joins import hash_lookup_join


def _form_id(s: str) -> int:
    # 63-bit: int64-safe everywhere, SQL-replicable
    return _stable_u64(s) >> 1


def entity_resolution(sf_dir: str, *, col: str = "p_name",
                      table: str = "part", num_partitions: int = 8):
    """Full resolution table over ``table.col`` surface forms:
    (form, canonical, cluster_size), sorted by form."""
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])
    forms = (ds.groupby(col).aggregate(Count(alias_name="n"))
             .map_batches(lambda b: b, batch_format="pyarrow"))

    def add_id(b: pa.Table) -> pa.Table:
        names = b[col].to_pylist()
        return pa.table({
            "form": b[col],
            "n": b["n"],
            "fid": pa.array([_form_id(s or "") for s in names], pa.int64()),
        })

    fid = forms.map_batches(add_id, batch_format="pyarrow").materialize()

    pairs = fuzzy_form_pairs(ds, col=col)

    def pair_ids(b: pa.Table) -> pa.Table:
        a = [_form_id(s or "") for s in b["name_a"].to_pylist()]
        c = [_form_id(s or "") for s in b["name_b"].to_pylist()]
        return pa.table({"id_a": pa.array(a, pa.int64()),
                         "id_b": pa.array(c, pa.int64())})

    def self_pairs(b: pa.Table) -> pa.Table:
        return pa.table({"id_a": b["fid"], "id_b": b["fid"]})

    all_pairs = (pairs.map_batches(pair_ids, batch_format="pyarrow")
                 .union(fid.map_batches(self_pairs,
                                        batch_format="pyarrow")))
    cc = connected_components(all_pairs, id_a="id_a", id_b="id_b",
                              out_id_col="fid",
                              num_partitions=num_partitions)

    members = hash_lookup_join(
        fid, cc.map_batches(
            lambda b: b.rename_columns(["fid", "cluster"]),
            batch_format="pyarrow"),
        on="fid", num_partitions=num_partitions)

    def canon_and_size(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "form"], ascending=[False, True])
        out = g[["form"]].copy()
        out["canonical"] = g["form"].iloc[0]
        out["cluster_size"] = len(g)
        return out

    out = (members.groupby("cluster")
           .map_groups(canon_and_size, batch_format="pandas")
           .map_batches(lambda b: b, batch_format="pyarrow"))
    pdf = out.to_pandas()
    pdf["cluster_size"] = pdf["cluster_size"].astype("int64")
    return pdf.sort_values("form").reset_index(drop=True)
