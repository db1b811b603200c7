"""Token taggers: the deterministic heuristic NER tagger and the model stub.

``HeuristicTagger`` re-implements, from scratch, the rule cascade of the
reference pseudo-labeler (/root/reference/src/data_labeling/pseudo_labeler.py:
45-158): price rules (numeric+ብር pair, ብር-embedded amounts with B/I chaining
off the previous emitted label, ዋጋ-prefix lookahead), greedy substring-match
location phrases, and exact-match product phrases with descriptor
continuation.  Rule order (price → location → product → O) and every greedy
continuation condition match the reference; behavior is pinned by golden
fixtures captured by executing the reference (scripts/capture_goldens.py) and
by a differential test over the full template corpus.

The tagger interface is the engine's extension point (SURVEY.md §2.10): any
callable ``tag(tokens) -> list[(token, bio_label)]``.  ``ModelTagger`` is the
interface-compatible HF token-classification variant (reference
model_evaluator.py:44-87) — weights are unavailable in this sandbox, so it
raises unless ``transformers`` + a model dir are present; the Ray-side
plumbing (actor-pool ``__init__`` load-once, batched ``__call__``) is real.
"""

from __future__ import annotations

import re

NUMERIC = re.compile(r"^\d[\d,\.]*$")
_NUM_SPLIT = re.compile(r"(\d[\d,\.]*)")
_HAS_DIGIT = re.compile(r"\d")

LOCATION_KEYWORDS = (
    "መገናኛ", "ለቡ", "ስሪ", "ኤም", "ሲቲ", "ሞል", "ታሜ", "ጋስ", "ህንፃ",
    "መዳህኒዓለም", "ቤተ/ክርስቲያን", "#ዛም_ሞል", "ቁ.1", "ቁ.2", "ቢሮ", "ቁጥር",
)
LOCATION_CONTEXT = frozenset({"ፎቅ", "ፊት", "ለ", "ጎን", "ቢሮ", "ቁ."})

ENGLISH_PRODUCT_INDICATORS = frozenset({
    "product", "set", "machine", "maker", "blender", "stove", "pan",
    "humidifier", "cleaner", "bags", "brush", "lamp", "pad", "tape", "mop",
    "bottle", "air fryer", "knife", "oven", "grinder", "rack", "bowl", "tray",
    "dispenser", "massager", "cup", "crepe", "towel", "cap", "light",
    "corrector", "blanket", "shaper", "heater", "scrubber", "epilator",
    "vibrator", "slicer", "guard", "warmer", "clipper", "lunch", "steamer",
    "play mat", "massage", "bag", "diffuser", "spice", "container",
    "hair curler", "food storage", "diaper", "dumpling", "organizer",
    "charcoal burner", "bathroom set", "toilet", "dish washing gloves",
    "cookware", "mixer", "juicer", "nutties", "biscuits", "omelette",
    "waffles", "snacks", "aprons", "abacus", "nail", "thermometer", "tweezer",
    "scissor", "aspirator", "medicine dispenser", "tooth brush", "portable",
    "electric", "stainless steel", "silicon", "mini", "automatic",
    "rechargeable", "smart", "adjustable", "foldable", "multipurpose",
    "multinational", "luxury", "quality", "style", "expert",
})

AMHARIC_PRODUCT_INDICATORS = frozenset({
    "ምርጥ", "እቃ", "ልብስ", "ማሳጅ", "መፍጫ", "መቁረጫ", "ማድረቂያ", "ማጠቢያ",
    "ማስቀመጫ", "ድስት", "መጥበሻ", "ቢላ", "ሻወር", "ዳይፐር", "ማቅረቢያ", "ምድጃ",
    "ስቶቭ", "ማሰሮ", "መወልወያ", "መብራት", "ስብስብ", "ስላይስ", "ማሽን", "ክሬም",
    "ቡና", "እንቁላል", "ሊጥ", "ጁስ", "አትክልት", "ስጋ", "ቦርጭ", "ፀጉር", "ፂም",
    "መቆረጪያ", "ቶንዶስ", "አማራጭ", "ብርጭቆ", "ሙቀት", "ምጣድ", "መጭመቂያ",
    "የጽዳት", "እንጨት", "መደርደሪያ",
})

PRODUCT_DESCRIPTORS = frozenset({
    "high", "quality", "new", "original", "style", "luxury", "portable",
    "electric", "stainless", "steel", "silicon", "mini", "automatic",
    "rechargeable", "smart", "adjustable", "foldable", "multipurpose",
    "multinational", "excellent", "durable", "best", "smooth", "effective",
    "waterproof", "ceramic", "glass", "bamboo", "wooden", "flexible", "long",
    "handled", "dual", "single", "multi-function", "set", "pcs", "pack", "in",
})

PRICE_TRIGGERS = frozenset({"ዋጋ", "ዋጋ፦", "ዋጋ:-", "price-"})

# entity type → KG predicate (north star: the four G6/M16 buckets)
PRED_BY_TYPE = {
    "PRODUCT": "has_product",
    "PRICE": "priced_at",
    "LOC": "located_in",
    "CONTACT_INFO": "contacted_via",
}


# single-scan alternation ≡ any(kw in tok for kw in LOCATION_KEYWORDS)
_LOC_RX = re.compile("|".join(re.escape(k) for k in LOCATION_KEYWORDS))

_PRODUCT_WORDS = ENGLISH_PRODUCT_INDICATORS | AMHARIC_PRODUCT_INDICATORS


def _is_location_like(tok: str) -> bool:
    return _LOC_RX.search(tok) is not None


def _is_product_word(low: str) -> bool:
    return low in _PRODUCT_WORDS


def _numeric(tok: str) -> bool:
    # ^\d[\d,\.]*$ with a cheap first-char pre-test (most tokens fail here)
    return bool(tok) and tok[0].isdigit() and NUMERIC.match(tok) is not None


class HeuristicTagger:
    """Deterministic rule-based BIO tagger (engine default; no weights).

    Per-token PREDICATES (lower(), numeric regex, location-keyword search)
    are pure functions of the token and memoized across calls — token
    distributions are Zipfian, so on real corpora most lookups hit the cache
    and the regex scans run once per distinct token per worker."""

    def __init__(self):
        self._preds: dict[str, tuple[str, bool, bool]] = {}

    def _pred(self, tok: str) -> tuple[str, bool, bool]:
        """(lower, is_numeric, is_location_like) with bounded memoization."""
        p = self._preds.get(tok)
        if p is None:
            p = (tok.lower(), _numeric(tok), _is_location_like(tok))
            if len(self._preds) < 262_144:
                self._preds[tok] = p
        return p

    def tag(self, tokens: list[str]) -> list[tuple[str, str]]:
        out: list[tuple[str, str]] = []
        n = len(tokens)
        preds = [self._pred(t) for t in tokens]
        lows = [p[0] for p in preds]
        i = 0
        while i < n:
            tok = tokens[i]
            low = lows[i]

            # price: "<number> ብር" pair
            if preds[i][1] and i + 1 < n and lows[i + 1] == "ብር":
                out.append((tok, "B-PRICE"))
                out.append((tokens[i + 1], "I-PRICE"))
                i += 2
                continue

            # price: amount embedded with ብር in one token ("550ብር", "1,200ብር")
            if "ብር" in low and _HAS_DIGIT.search(tok):
                for piece in _NUM_SPLIT.split(tok):
                    if not piece:
                        continue
                    if _numeric(piece):
                        # B- when the running sequence is empty or last label O
                        if not out or out[-1][1] == "O":
                            out.append((piece, "B-PRICE"))
                        else:
                            out.append((piece, "I-PRICE"))
                    elif piece.lower() == "ብር":
                        out.append((piece, "I-PRICE"))
                    else:
                        out.append((piece, "O"))
                i += 1
                continue

            # price: ዋጋ trigger with numeric (+ ብር) lookahead
            if low in PRICE_TRIGGERS:
                out.append((tok, "B-PRICE"))
                i += 1
                if i < n and preds[i][1]:
                    out.append((tokens[i], "I-PRICE"))
                    i += 1
                    if i < n and lows[i] == "ብር":
                        out.append((tokens[i], "I-PRICE"))
                        i += 1
                continue

            # location: greedy phrase while tokens look location-like
            if preds[i][2]:
                j = i
                while j < n and (
                    preds[j][2]
                    or preds[j][1]
                    or lows[j] in LOCATION_CONTEXT
                ):
                    j += 1
                out.append((tokens[i], "B-LOC"))
                out.extend((tokens[k], "I-LOC") for k in range(i + 1, j))
                i = j
                continue

            # product: exact-match indicator, continue over descriptors/numbers
            if _is_product_word(low):
                j = i + 1
                while j < n:
                    nxt = lows[j]
                    if (
                        _is_product_word(nxt)
                        or preds[j][1]
                        or nxt in PRODUCT_DESCRIPTORS
                    ):
                        j += 1
                    else:
                        break
                out.append((tokens[i], "B-PRODUCT"))
                out.extend((tokens[k], "I-PRODUCT") for k in range(i + 1, j))
                i = j
                continue

            out.append((tok, "O"))
            i += 1
        return out


class ModelTagger:
    """HF token-classification tagger behind the same interface (A1).

    Loads weights once per instance — in Ray this class is used as an
    actor-pool ``map_batches`` callable so ``__init__`` runs once per actor
    (reference loads per-process at model_evaluator.py:44-87 and then loops
    rows; here inference is batched).
    """

    def __init__(self, model_dir: str, device: int = -1):
        try:
            from transformers import (AutoModelForTokenClassification,
                                      AutoTokenizer, pipeline)
        except ImportError as exc:  # pragma: no cover - sandbox has no torch
            raise NotImplementedError(
                "transformers/torch not available in this environment; "
                "use HeuristicTagger (deterministic) instead"
            ) from exc
        tok = AutoTokenizer.from_pretrained(model_dir)
        model = AutoModelForTokenClassification.from_pretrained(model_dir)
        self.pipe = pipeline(
            "token-classification", model=model, tokenizer=tok,
            aggregation_strategy="simple", device=device,
        )

    def tag(self, tokens: list[str]) -> list[tuple[str, str]]:
        text = " ".join(tokens)
        spans = self.pipe(text)
        return align_spans_to_tokens(text, tokens, spans)


def align_spans_to_tokens(text: str, tokens: list[str], spans: list[dict]) -> list[tuple[str, str]]:
    """Char-cursor BIO alignment of model spans onto pipeline tokens (M18,
    reference model_evaluator.py:144-196): map each token to its char range
    via a running ``str.find`` cursor, then overwrite O with B-/I- for tokens
    overlapping a predicted span (first prediction wins)."""
    labels = ["O"] * len(tokens)
    ranges: list[tuple[int, int]] = []
    cursor = 0
    for tok in tokens:
        pos = text.find(tok, cursor)
        if pos < 0:
            ranges.append((-1, -1))
            continue
        ranges.append((pos, pos + len(tok)))
        cursor = pos + len(tok)
    for span in spans:
        s, e, group = span["start"], span["end"], span["entity_group"]
        first = True
        for idx, (ts, te) in enumerate(ranges):
            if ts < 0 or te <= s or ts >= e:
                continue
            if labels[idx] == "O":
                labels[idx] = ("B-" if first else "I-") + group
            first = False
    return list(zip(tokens, labels))


def decode_entities(tagged: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """BIO decode → [(entity_type, surface)] with surfaces space-joined.

    Standard decode: an entity starts at B-X, or at I-X that does not continue
    a run of the same type (mirrors HF "simple" aggregation over clean BIO).
    """
    entities: list[tuple[str, str]] = []
    cur_type: str | None = None
    cur_toks: list[str] = []
    for tok, label in tagged:
        if label == "O" or not label:
            if cur_type:
                entities.append((cur_type, " ".join(cur_toks)))
                cur_type, cur_toks = None, []
            continue
        prefix, _, etype = label.partition("-")
        if prefix == "B" or etype != cur_type:
            if cur_type:
                entities.append((cur_type, " ".join(cur_toks)))
            cur_type, cur_toks = etype, [tok]
        else:
            cur_toks.append(tok)
    if cur_type:
        entities.append((cur_type, " ".join(cur_toks)))
    return entities
