"""Deterministic synthetic corpus in the north-rule input shape.

Input table (authoritative, BASELINE.json input_hint):
``(repo:string, path:string, commit:string, lang:string, content:string)``
plus engine-derived ``message_id``, ``views``, ``message_date``.

Every derivation is pure integer/string arithmetic over ``doc_id`` so a DuckDB
oracle can rebuild the identical table in SQL (see __ray_entry__.oracle_sql):

- ``repo``:    doc_id % 10 < 3 → ``vendor_000`` (mega-vendor, ≥30% of rows —
               the skew case SURVEY.md §4 calls out), else
               ``vendor_{(doc_id % 17) + 1:03d}``
- ``path``:    ``msgs/{doc_id:08d}.txt``
- ``commit``:  sha256 hex of str(doc_id)  (DuckDB: ``sha256(doc_id::VARCHAR)``)
- ``lang``:    ``en`` when doc_id % 10 == 7 else ``am``
- ``content``: TEMPLATES[doc_id % len(TEMPLATES)] — Amharic e-commerce
  messages exercising every normalize rule and tagger rule (fidel variants,
  Geez numerals, Ethiopic punctuation, URLs/mentions/hashtags/emoji, price /
  location / product / contact surface forms; cites:
  /root/reference/src/data_preprocessing/text_preprocessor.py:17-59,
  /root/reference/src/data_labeling/pseudo_labeler.py:92-125)
- ``views``:   (doc_id * 9973 + 12345) % 5000
- ``message_date``: DATE '2024-01-01' + ((doc_id * 37) % 365) days
- ``message_id``: doc_id

The per-row invariant ``content_sha256 = sha256(content)`` is attached by the
normalize stage and must survive every downstream stage unchanged.
"""

from __future__ import annotations

import hashlib
from datetime import date, timedelta

import numpy as np
import pyarrow as pa

# Deliberately diverse message templates.  Indexes are load-bearing: golden
# normalize/tag/triple fixtures (goldens.py) and the DuckDB oracles key on
# ``doc_id % len(TEMPLATES)``.
TEMPLATES: list[str] = [
    # 0: FIXTURES.md §3 row 1 — Geez numerals, Ethiopic punct, mention/hashtag/emoji/URL
    "ጤና ይስጥልኝ! ዋጋው ፻፳፭ ብር ነው። አድራሻችን መገናኛ ስሪ ኤም ሲቲ ሞል ነው። @Shageronlinestore #ቅናሽ 😊 https://t.me/example_product",
    # 1: fidel variants
    "ሃሎ ኋይት ሧት ፅናት",
    # 2: ዋጋ፦ price with attached digits
    "ዋጋ፦500ብር።",
    # 3: mixed English, colon price, hashtag-with-underscore, mention
    "Hello World! ዋጋ: 1000 ብር. #አዲስ_እቃ @AmharicStore",
    # 4: English product + ETB price + location + phone
    "Dell laptop ዋጋ 25000 ETB አድራሻ ቦሌ +251911123456",
    # 5: FIXTURES.md §4 — heuristic tagger golden
    "ዋጋ፦550ብር መገናኛ ዛም ሞል portable blender electric",
    # 6: Geez numerals + repeated punct + contact number
    "ምርጥ stove ፳፭ ብር ብቻ!!! ውስን እቃ ነው፣ ይደውሉ 0911234567",
    # 7: empty message (M13: row kept, empty entity lists)
    "",
    # 8: whitespace + emoji only
    "   😊🔥   ",
    # 9: comma price, location with ቁ.2, www URL
    "silicon brush ማሽን 1,200ብር ለቡ ሞል ቁ.2 ይገኛል www.example.com",
    # 10: multi-word location with ፎቅ/ቢሮ/ቁጥር + plain price
    "ላፕቶፕ እና ስልክ በመገናኛ ፎቅ 3 ቢሮ ቁጥር 12 ዋጋ 3500 ብር",
    # 11: repeated Ethiopic punct runs + Geez price
    "አዲስ እቃ።።። ዋጋ፡- ፲፭፻ ብር... በጣም ምርጥ!!!",
    # 12-49: widened oracle corpus (VERDICT r1 #9) — ≥50 distinct contents so
    # the per-template oracles cover far more than the original 12 shapes.
    # Every entry still exercises reference-matched normalize/tag rules.
    "air fryer ምርጥ እቃ ዋጋ 4500 ብር ይደውሉ 0922334455",
    "ዋጋ 750 ብር ብቻ! ለቡ መዳህኒዓለም ቤተ/ክርስቲያን ጎን",
    "knife set stainless steel ዋጋ: 2,350 ብር #ቅናሽ",
    "ሃያ አምስት በመቶ ቅናሽ!!! humidifier 1800ብር",
    "ጁስ መፍጫ ማሽን ዋጋ፦ 3,000 ብር። አድራሻ፡ መገናኛ ዛም ሞል ቢሮ ቁ.1",
    "baby diaper bags በጣም ምርጥ 950 ብር @ShegerKids https://t.me/shegerkids",
    "ሀሎ ሰላም ነው ዛሬ ምንም ሽያጭ የለም",
    "mop ማጠቢያ እና መወልወያ ስብስብ ፶፭ ብር",
    "ዋጋ፦1,250ብር። electric stove ምድጃ ከነ መጥበሻ",
    "ስልክ ቁጥር 0911 22 33 44 ይደውሉ፣ መገናኛ ታሜ ጋስ ህንፃ ፎቅ 2",
    "portable juicer rechargeable ዋጋ 1750 ETB",
    "እንኳን ደህና መጡ! አዲስ እቃ ገብቷል፤ ዋጋ ፪፻፶ ብር ብቻ።",
    "hair curler ፀጉር ማሽን 2200ብር ለቡ ሲቲ ሞል ቁ.2",
    "Original quality ስሪ ኤም ሲቲ ሞል ቢሮ ቁጥር 5 ዋጋ 600 ብር",
    "ድስት ስብስብ 12 pcs ceramic ዋጋ: 5,500 ብር!!!",
    "yoga mat እና ማሳጅ ስብስብ — ዋጋ 1300 ብር 😊😊",
    "ኦርጅናል ብርጭቆ 6 pcs ፻ ብር ብቻ፣ ውስን ነው",
    "smart watch እጅግ ምርጥ ዋጋ 3,999 ብር @SmartAddis",
    "ማስቀመጫ መደርደሪያ foldable 880ብር ደውሉ 0933445566",
    "ዋጋ:- 425 ብር silicon brush ስብስብ",
    "መኪና ውስጥ ማስቀመጫ organizer 700 ብር ቦሌ መዳህኒዓለም አካባቢ",
    "coffee maker ቡና ማሽን ዋጋ ፲፻ ብር ነው።",
    "ልብስ ማድረቂያ rack adjustable 2450 ብር #አዲስ_እቃ",
    "ቢላ መቁረጫ knife sharpener 350ብር ብቻ!!!",
    "electric kettle 1.8L ዋጋ፦ 980 ብር፤ አድራሻ መገናኛ ሞል",
    "ሕፃን ልብስ ስብስብ cotton ዋጋ 1,150 ብር 🔥",
    "LED መብራት rechargeable lamp ፸፭ ብር",
    "ዋጋ 2800 ብር blender ጁስ መፍጫ German standard",
    "massager ማሳጅ ማሽን ዘመናዊ ዋጋ: 3750 ብር 0944556677",
    "የፀጉር ማድረቂያ hair dryer 1600ብር ስሪ ኤም ሲቲ ሞል",
    "ምጣድ electric injera maker ዋጋ ፭፻፶ ብር",
    "ውሃ ማጣሪያ water filter 7 stage 4,200 ብር ይምጡ ለቡ ሞል ቁ.1",
    "ጫማ shoes rack 4 layer 1050 ብር #ListingSale",
    "ዋጋ፦ 3,500 ብር። air purifier ከ HEPA filter ጋር።",
    "ስጋ መፍጫ meat grinder 2,750ብር በሞባይል 0955667788 ይደውሉ",
    "የጽዳት እቃ cleaner spray 199 ብር ብቻ!!!",
    "ኤሌክትሪክ ምድጃ oven 45L ዋጋ 8,900 ብር መገናኛ ህንፃ ፎቅ 1",
    "toy abacus ለልጆች 450 ብር፣ እንዲሁም play mat 1,200 ብር",
    # 44-49: realistic LONG posts (multi-sentence, 300-600 bytes) — Telegram
    # e-commerce messages run long; these keep the per-byte cost of the
    # normalize/tag kernels represented in the bench mix
    "እንኳን ወደ መደብራችን በደህና መጡ! ዛሬ ልዩ ቅናሽ አለን። ይህ ዘመናዊ multipurpose blender ጁስ መፍጫ ማሽን ከ 6 ወር ዋስትና ጋር ነው። ፍራፍሬ፣ አትክልት እና ቡና መፍጨት ይችላል። ዋጋ፦ 4,850 ብር ብቻ። አድራሻ፡ መገናኛ ዛም ሞል ፎቅ 2 ቢሮ ቁጥር 14። ለትዕዛዝ 0911223344 ይደውሉ ወይም @ShegerStore ይጻፉ። ፈጣን ዴሊቨሪ በመላው አዲስ አበባ! https://t.me/shegerstore #ቅናሽ #አዲስ_እቃ 😊🔥",
    "High quality stainless steel cookware ስብስብ 12 pcs — ድስት፣ መጥበሻ እና ማንኪያ ከነ ማቅረቢያ። German standard ነው፣ induction stove ላይ ይሰራል። የቀድሞ ዋጋ 9,500 ብር፤ የአሁኑ ዋጋ 7,200 ብር ብቻ!!! ውስን እቃ ነው፣ ቶሎ ይደውሉ 0922 33 44 55። አድራሻችን ለቡ መዳህኒዓለም ቤተ/ክርስቲያን ጎን፣ ሲቲ ሞል ቁ.1። እሁድም እንከፍታለን።",
    "አዲስ ገቢ!!! Portable rechargeable hair curler እና ፀጉር ማድረቂያ ስብስብ። ለጉዞ ምቹ፣ ቀላል እና ፈጣን። ሙቀት መቆጣጠሪያ አለው። ዋጋ ፪ ሺህ ፭፻ ብር። እንዲሁም mini massager ማሳጅ ማሽን 1,100 ብር። ሁለቱን አብረው ሲገዙ 3,300 ብር ብቻ። መገናኛ ታሜ ጋስ ህንፃ ፎቅ 1 ቢሮ ቁ.2 እንገኛለን። ስልክ፡ 0933445566። #ListingSale #ቅናሽ 💇‍♀️✨",
    "Dear customers, ለበዓል ልዩ ዝግጅት! ይህ luxury bathroom set — towel, soap dispenser, tooth brush holder እና mirror — ከፍተኛ ጥራት ያለው silicon እና ceramic ነው። ዋጋ: 2,999 ብር። በተጨማሪ electric kettle 1.8L በ 950 ብር፣ water filter በ 4,100 ብር። ሁሉም እቃዎች ዋስትና አላቸው። አድራሻ፡ ቦሌ መዳህኒዓለም አካባቢ፣ ስሪ ኤም ሲቲ ሞል ምድር ቤት። ይደውሉ፡ +251944556677 ወይም ይጎብኙን www.example-shop.com 🛁",
    "ለልጆች የተዘጋጀ ልዩ ስብስብ! Educational toy abacus፣ play mat እና ህፃን ልብስ cotton ስብስብ። ለ 1-5 ዓመት ልጆች ተስማሚ። ጥራቱ የተረጋገጠ፣ ከ non-toxic ቁሳቁስ የተሰራ። Abacus ዋጋ 450 ብር፣ play mat 1,200 ብር፣ ልብስ ስብስብ 1,150 ብር። ሶስቱንም አብረው ሲወስዱ 2,500 ብር ብቻ!!! ዴሊቨሪ አለን። መገናኛ ሞል ፎቅ 3 ቢሮ ቁጥር 12። ስልክ 0955 66 77 88። ቶሎ ይምጡ፣ እቃው ውስን ነው።።። 👶🧸toys",
    "ውድ ደንበኞቻችን፣ አዲስ ዕቃ ገብቶልናል! Smart watch ከ fitness tracker ጋር — የልብ ምት መለኪያ፣ እርምጃ ቆጣሪ እና notification ማሳያ አለው። ከ iPhone እና Android ጋር ይሰራል። ዋጋው ፫ ሺህ ፱፻ ብር ነው። እንዲሁም wireless earbuds በ 1,800 ብር እና power bank 20000mAh በ 1,450 ብር። ሁሉም ኦርጅናል ናቸው። አድራሻ፡ መገናኛ ዛም ሞል ቁ.2። ለማዘዝ @SmartAddis ይጻፉ ወይም 0911 99 88 77 ይደውሉ። Free delivery ከ 3,000 ብር በላይ ለሚገዙ! ⌚📱",
]

N_TEMPLATES = len(TEMPLATES)
EPOCH = date(2024, 1, 1)

CORPUS_SCHEMA = pa.schema([
    ("message_id", pa.int64()),
    ("repo", pa.string()),
    ("path", pa.string()),
    ("commit", pa.string()),
    ("lang", pa.string()),
    ("content", pa.string()),
    ("views", pa.int64()),
    ("message_date", pa.date32()),
])


def corpus_batch(doc_ids: np.ndarray) -> pa.Table:
    """Build corpus rows for a batch of doc ids — the vectorized generator
    used both by ``corpus_from_documents`` (map_batches) and ``make_corpus``."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    tmpl_idx = ids % N_TEMPLATES
    is_mega = (ids % 10) < 3
    vendor_no = (ids % 17) + 1
    repo = np.where(
        is_mega,
        "vendor_000",
        np.char.add("vendor_", np.char.zfill(vendor_no.astype(str), 3)),
    )
    path = np.char.add(np.char.add("msgs/", np.char.zfill(ids.astype(str), 8)), ".txt")
    commit = [hashlib.sha256(str(i).encode()).hexdigest() for i in ids]
    lang = np.where(ids % 10 == 7, "en", "am")
    content = [TEMPLATES[t] for t in tmpl_idx]
    views = (ids * 9973 + 12345) % 5000
    dates = [EPOCH + timedelta(days=int((i * 37) % 365)) for i in ids]
    return pa.table(
        {
            "message_id": pa.array(ids, pa.int64()),
            "repo": pa.array(repo.tolist(), pa.string()),
            "path": pa.array(path.tolist(), pa.string()),
            "commit": pa.array(commit, pa.string()),
            "lang": pa.array(lang.tolist(), pa.string()),
            "content": pa.array(content, pa.string()),
            "views": pa.array(views, pa.int64()),
            "message_date": pa.array(dates, pa.date32()),
        },
        schema=CORPUS_SCHEMA,
    )


def corpus_from_documents(sf_dir: str):
    """Derive the corpus Dataset from the driver's documents table.

    Streams: reads only ``doc_id`` (column pruning at the read) and expands
    each id into a corpus row inside map_batches — no driver-side
    materialization, scales with the documents table.
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return ds.map_batches(
        lambda b: corpus_batch(b["doc_id"]),
        batch_format="numpy",
        batch_size=8192,
    )


def make_corpus(out_dir: str, n_rows: int, *, block_rows: int = 8192):
    """Write a synthetic corpus of ``n_rows`` to partitioned Parquet.

    Uses ``ray.data.range`` so generation itself is distributed; for the 100 TB
    analog this is the stand-in for reading the real repo-file table.
    ``block_rows`` sets the output file granularity — the downstream read's
    parallelism unit (≥ 2-4 files per CPU for a full-width scan).
    """
    import ray.data as rd

    ds = rd.range(n_rows, override_num_blocks=max(1, n_rows // block_rows))
    ds = ds.map_batches(
        lambda b: corpus_batch(b["id"]),
        batch_format="numpy",
        batch_size=block_rows,
    )
    ds.write_parquet(out_dir)
    return out_dir
