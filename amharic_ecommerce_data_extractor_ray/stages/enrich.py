"""Embarrassingly-parallel map stages: normalize, tokenize, tag, entity-extract.

Each stage is a vectorized batch function over Arrow batches
(``batch_format="pyarrow"``) — Ray's streaming executor fuses consecutive
task-based map stages, so the whole normalize→tokenize→tag→extract chain runs
as one pass over each block with zero intermediate materialization.

Heuristic tagging is *stateless* (module-level compiled rules) and runs as
elastic tasks; only the model tagger (``ModelTagStage``) is an actor pool,
mirroring SURVEY.md §7.4.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..functions.normalize import preprocess_amharic_text
from ..functions.prices import extract_numerical_price, is_nan
from ..functions.tagger import (HeuristicTagger, PRED_BY_TYPE, decode_entities)
from ..functions.tokenize import tokenize_amharic_text

_TAGGER = HeuristicTagger()

TOKENS_TYPE = pa.list_(pa.string())


def _nfc(texts: list) -> list[str]:
    import unicodedata

    return [unicodedata.normalize("NFC", t) if t else "" for t in texts]


def enrich_batch(batch: pa.Table, *, remove_stopwords: bool = False) -> pa.Table:
    """content → + content_sha256, preprocessed_text, tokens.

    The sha256 is computed on the RAW content and carried through every
    downstream stage unchanged (per-row invariant, BASELINE.json input_hint).
    Empty/None text keeps its row (M13 notebook semantics: keep row, empty
    results downstream).  The default (no-stopword) path runs on the Arrow
    re2 kernels (functions/normalize_vec — 2-3× the scalar throughput, exact
    parity pinned by fuzz tests); the stopword variant stays scalar.
    """
    from ..functions.normalize_vec import (normalize_array_post_nfc,
                                           tokenize_prepare_array,
                                           tokens_from_prepared)

    texts = batch["content"].to_pylist()
    sha = [hashlib.sha256((t or "").encode("utf-8")).hexdigest() for t in texts]
    if remove_stopwords:
        norm = [preprocess_amharic_text(t, True) for t in texts]
        toks = [tokenize_amharic_text(n) for n in norm]
        norm_arr = pa.array(norm, pa.string())
    else:
        norm_arr = normalize_array_post_nfc(pa.array(_nfc(texts), pa.string()))
        prepared = tokenize_prepare_array(norm_arr).to_pylist()
        toks = [tokens_from_prepared(p) for p in prepared]
    return (
        batch
        .append_column("content_sha256", pa.array(sha, pa.string()))
        .append_column("preprocessed_text", norm_arr)
        .append_column("tokens", pa.array(toks, TOKENS_TYPE))
    )


def tag_batch(batch: pa.Table) -> pa.Table:
    """tokens → + tag_tokens, tag_labels (BIO), via the stateless heuristic
    tagger.  Tag tokens may differ from input tokens (the price rules split
    ብር-attached amounts, pseudo_labeler.py:62-75)."""
    tokens_col = batch["tokens"].to_pylist()
    tag_tokens: list[list[str]] = []
    tag_labels: list[list[str]] = []
    for toks in tokens_col:
        pairs = _TAGGER.tag(toks or [])
        tag_tokens.append([p[0] for p in pairs])
        tag_labels.append([p[1] for p in pairs])
    return (
        batch
        .append_column("tag_tokens", pa.array(tag_tokens, TOKENS_TYPE))
        .append_column("tag_labels", pa.array(tag_labels, TOKENS_TYPE))
    )


class ModelTagStage:
    """Actor-pool stage for the HF model tagger (A1).

    Weights load ONCE per actor in ``__init__``; ``__call__`` tags a batch.
    Use as ``ds.map_batches(ModelTagStage, fn_constructor_kwargs={...},
    concurrency=N, batch_size=B, num_gpus=G)``.
    """

    def __init__(self, model_dir: str, device: int = -1):
        from ..functions.tagger import ModelTagger

        self.tagger = ModelTagger(model_dir, device=device)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tokens_col = batch["tokens"].to_pylist()
        tag_tokens, tag_labels = [], []
        for toks in tokens_col:
            pairs = self.tagger.tag(toks or [])
            tag_tokens.append([p[0] for p in pairs])
            tag_labels.append([p[1] for p in pairs])
        return (
            batch
            .append_column("tag_tokens", pa.array(tag_tokens, TOKENS_TYPE))
            .append_column("tag_labels", pa.array(tag_labels, TOKENS_TYPE))
        )


class NumpyModelTagStage:
    """Actor-pool model-inference stage with a REAL forward pass (A1 verified
    end to end; VERDICT r1 #3).  Weights build ONCE per actor in ``__init__``;
    ``__call__`` runs ONE batched matmul over every subword in the batch —
    the amortized shape real model serving needs — then splits predictions
    back per sentence, aggregates spans and aligns them onto pipeline tokens
    (M18).  Deterministic (seeded weights) → oracle-checkable.

    With torch available, ``ModelTagStage`` above is the drop-in HF variant;
    the per-batch contract is identical.
    """

    def __init__(self, *, dim: int = 32, seed: int = 20240801):
        from ..functions.np_model import NumpyTokenClassifier

        self.model = NumpyTokenClassifier(dim=dim, seed=seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.np_model import NumpyTokenClassifier
        from ..functions.tagger import align_spans_to_tokens

        tokens_col = batch["tokens"].to_pylist()
        piece_meta = []
        flat_pieces: list[str] = []
        for toks in tokens_col:
            pieces, _ = NumpyTokenClassifier._pieces_with_offsets(toks or [])
            piece_meta.append(pieces)
            flat_pieces.extend(p for p, _, _ in pieces)
        preds = self.model.forward(flat_pieces)        # one matmul per batch
        tag_tokens, tag_labels = [], []
        off = 0
        for toks, pieces in zip(tokens_col, piece_meta):
            pr = preds[off:off + len(pieces)]
            off += len(pieces)
            spans = NumpyTokenClassifier._aggregate(pieces, pr)
            pairs = align_spans_to_tokens(" ".join(toks or []), toks or [],
                                          spans)
            tag_tokens.append([p[0] for p in pairs])
            tag_labels.append([p[1] for p in pairs])
        return (
            batch
            .append_column("tag_tokens", pa.array(tag_tokens, TOKENS_TYPE))
            .append_column("tag_labels", pa.array(tag_labels, TOKENS_TYPE))
        )


def entities_batch(batch: pa.Table) -> pa.Table:
    """BIO tags → per-message entity list columns (nb 03 cell 11 / M16-M17):
    products/prices/locations/contact_info + all_numerical_prices (NaNs
    dropped, nb semantics)."""
    tag_tokens = batch["tag_tokens"].to_pylist()
    tag_labels = batch["tag_labels"].to_pylist()
    buckets: dict[str, list[list[str]]] = {
        "PRODUCT": [], "PRICE": [], "LOC": [], "CONTACT_INFO": []}
    numeric_prices: list[list[float]] = []
    for toks, labs in zip(tag_tokens, tag_labels):
        ents = decode_entities(list(zip(toks or [], labs or [])))
        row: dict[str, list[str]] = {k: [] for k in buckets}
        for etype, surface in ents:
            if etype in row:
                row[etype].append(surface)
        for k, acc in buckets.items():
            acc.append(row[k])
        vals = [extract_numerical_price([p]) for p in row["PRICE"]]
        numeric_prices.append([v for v in vals if not is_nan(v)])
    return (
        batch
        .append_column("products", pa.array(buckets["PRODUCT"], TOKENS_TYPE))
        .append_column("prices", pa.array(buckets["PRICE"], TOKENS_TYPE))
        .append_column("locations", pa.array(buckets["LOC"], TOKENS_TYPE))
        .append_column("contact_info", pa.array(buckets["CONTACT_INFO"], TOKENS_TYPE))
        .append_column("all_numerical_prices",
                       pa.array(numeric_prices, pa.list_(pa.float64())))
    )


def _tag_row(text: str | None) -> list[tuple[str, str]]:
    """content → normalize → tokenize → BIO pairs, no intermediate columns."""
    norm = preprocess_amharic_text(text, False)
    return _TAGGER.tag(tokenize_amharic_text(norm))


def _tag_rows(texts: list) -> list[list[tuple[str, str]]]:
    """Batch variant of _tag_row: normalize + tokenize-prepare run as Arrow
    re2 kernels over the whole column; only the final split and the rule
    tagger touch Python objects.  Parity with the scalar path is pinned by
    tests/test_differential_fuzz.py."""
    from ..functions.normalize_vec import (normalize_array_post_nfc,
                                           tokenize_prepare_array,
                                           tokens_from_prepared)

    norm = normalize_array_post_nfc(pa.array(_nfc(texts), pa.string()))
    prepared = tokenize_prepare_array(norm).to_pylist()
    return [_TAGGER.tag(tokens_from_prepared(p)) for p in prepared]


def fused_triples_batch(batch: pa.Table) -> pa.Table:
    """content → triples in ONE pass per row.

    Semantically identical to ``enrich_batch → tag_batch → triples_batch``
    (pinned by a differential test), but skips materializing the
    ``preprocessed_text`` / ``tokens`` / ``tag_tokens`` / ``tag_labels``
    Arrow list columns that the triples path immediately discards — under
    32-way concurrency the avoided allocation traffic is what scales, not
    just the saved CPU.  Use this in the hot KG build; the staged variants
    remain the composable/stage-inspectable path.
    """
    mids = batch["message_id"].to_pylist()
    repos = batch["repo"].to_pylist()
    texts = batch["content"].to_pylist()

    tagged = _tag_rows(texts)
    out_mid: list[int] = []
    out_subj: list[str] = []
    out_pred: list[str] = []
    out_obj: list[str] = []
    out_norm: list[str] = []
    out_price: list[float | None] = []
    out_sha: list[str] = []
    for mid, repo, text, pairs in zip(mids, repos, texts, tagged):
        sha = hashlib.sha256((text or "").encode("utf-8")).hexdigest()
        for etype, surface in decode_entities(pairs):
            pred = PRED_BY_TYPE.get(etype)
            if pred is None:
                continue
            price: float | None = None
            if etype == "PRICE":
                v = extract_numerical_price([surface])
                price = None if is_nan(v) else v
            out_mid.append(mid)
            out_subj.append(repo)
            out_pred.append(pred)
            out_obj.append(surface)
            out_norm.append(" ".join(surface.lower().split()))
            out_price.append(price)
            out_sha.append(sha)
    return pa.table({
        "message_id": pa.array(out_mid, pa.int64()),
        "subj": pa.array(out_subj, pa.string()),
        "pred": pa.array(out_pred, pa.string()),
        "obj": pa.array(out_obj, pa.string()),
        "obj_norm": pa.array(out_norm, pa.string()),
        "price_value": pa.array(out_price, pa.float64()),
        "content_sha256": pa.array(out_sha, pa.string()),
    })


def fused_entities_batch(batch: pa.Table) -> pa.Table:
    """content → per-message entity list columns in ONE pass per row
    (scorecard input).  Same fusion rationale as ``fused_triples_batch``;
    output matches ``enrich_batch → tag_batch → entities_batch`` minus the
    intermediate text/token columns the scorecard never reads."""
    texts = batch["content"].to_pylist()
    sha = [hashlib.sha256((t or "").encode("utf-8")).hexdigest() for t in texts]
    batch = batch.append_column("content_sha256", pa.array(sha, pa.string()))
    buckets: dict[str, list[list[str]]] = {
        "PRODUCT": [], "PRICE": [], "LOC": [], "CONTACT_INFO": []}
    numeric_prices: list[list[float]] = []
    for pairs in _tag_rows(texts):
        ents = decode_entities(pairs)
        row: dict[str, list[str]] = {k: [] for k in buckets}
        for etype, surface in ents:
            if etype in row:
                row[etype].append(surface)
        for k, acc in buckets.items():
            acc.append(row[k])
        vals = [extract_numerical_price([p]) for p in row["PRICE"]]
        numeric_prices.append([v for v in vals if not is_nan(v)])
    return (
        batch
        .append_column("products", pa.array(buckets["PRODUCT"], TOKENS_TYPE))
        .append_column("prices", pa.array(buckets["PRICE"], TOKENS_TYPE))
        .append_column("locations", pa.array(buckets["LOC"], TOKENS_TYPE))
        .append_column("contact_info", pa.array(buckets["CONTACT_INFO"], TOKENS_TYPE))
        .append_column("all_numerical_prices",
                       pa.array(numeric_prices, pa.list_(pa.float64())))
    )


def triples_from_entities_batch(batch: pa.Table) -> pa.Table:
    """Entity-list columns (fused_entities_batch output) → flat triple rows.

    The cheap derivation used when the tagged/entities table is already a
    persisted stage boundary (pipelines.kg.build_kg): the expensive
    normalize→tag pass runs ONCE, and triples / scorecard both read its
    output.  Produces the same multiset of rows as ``fused_triples_batch``
    (per-message ordering groups by entity type instead of scan order —
    irrelevant, the triple table is keyed, not ordered)."""
    mids = batch["message_id"].to_pylist()
    repos = batch["repo"].to_pylist()
    shas = batch["content_sha256"].to_pylist()
    by_type = {etype: batch[col].to_pylist()
               for etype, col in (("PRODUCT", "products"), ("PRICE", "prices"),
                                  ("LOC", "locations"),
                                  ("CONTACT_INFO", "contact_info"))}

    out_mid, out_subj, out_pred = [], [], []
    out_obj, out_norm, out_price, out_sha = [], [], [], []
    for i, (mid, repo, sha) in enumerate(zip(mids, repos, shas)):
        for etype, col in by_type.items():
            pred = PRED_BY_TYPE[etype]
            for surface in col[i] or []:
                price: float | None = None
                if etype == "PRICE":
                    v = extract_numerical_price([surface])
                    price = None if is_nan(v) else v
                out_mid.append(mid)
                out_subj.append(repo)
                out_pred.append(pred)
                out_obj.append(surface)
                out_norm.append(" ".join(surface.lower().split()))
                out_price.append(price)
                out_sha.append(sha)
    return pa.table({
        "message_id": pa.array(out_mid, pa.int64()),
        "subj": pa.array(out_subj, pa.string()),
        "pred": pa.array(out_pred, pa.string()),
        "obj": pa.array(out_obj, pa.string()),
        "obj_norm": pa.array(out_norm, pa.string()),
        "price_value": pa.array(out_price, pa.float64()),
        "content_sha256": pa.array(out_sha, pa.string()),
    })


def triples_batch(batch: pa.Table) -> pa.Table:
    """Tagged messages → flat triple rows (north star):
    ``(message_id, subj=repo, pred, obj, obj_norm, price_value,
    content_sha256)``.  ``obj_norm`` = lowercased, whitespace-collapsed
    surface (the canonicalization key); ``price_value`` = nb-03 price parse of
    the surface, NULL when unparseable."""
    mids = batch["message_id"].to_pylist()
    repos = batch["repo"].to_pylist()
    shas = batch["content_sha256"].to_pylist()
    tag_tokens = batch["tag_tokens"].to_pylist()
    tag_labels = batch["tag_labels"].to_pylist()

    out_mid: list[int] = []
    out_subj: list[str] = []
    out_pred: list[str] = []
    out_obj: list[str] = []
    out_norm: list[str] = []
    out_price: list[float | None] = []
    out_sha: list[str] = []
    for mid, repo, sha, toks, labs in zip(mids, repos, shas, tag_tokens, tag_labels):
        for etype, surface in decode_entities(list(zip(toks or [], labs or []))):
            pred = PRED_BY_TYPE.get(etype)
            if pred is None:
                continue
            price: float | None = None
            if etype == "PRICE":
                v = extract_numerical_price([surface])
                price = None if is_nan(v) else v
            out_mid.append(mid)
            out_subj.append(repo)
            out_pred.append(pred)
            out_obj.append(surface)
            out_norm.append(" ".join(surface.lower().split()))
            out_price.append(price)
            out_sha.append(sha)
    return pa.table({
        "message_id": pa.array(out_mid, pa.int64()),
        "subj": pa.array(out_subj, pa.string()),
        "pred": pa.array(out_pred, pa.string()),
        "obj": pa.array(out_obj, pa.string()),
        "obj_norm": pa.array(out_norm, pa.string()),
        "price_value": pa.array(out_price, pa.float64()),
        "content_sha256": pa.array(out_sha, pa.string()),
    })
