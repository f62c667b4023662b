"""The flagship extraction pipeline — Spark-first implementation.

Semantics: ``ocr_intern_spark.oracle.semantics`` (module docstring is
the spec; reference citations there). Architecture per SURVEY.md §3:

    scan → posexplode(spans)                       [narrow]
      ├── non-media spans → native Catalyst exprs  [narrow, codegen]
      └── media spans → repartition(media_ref)     [shuffle #1, balances
            → mapInPandas(recognize+fuse)            OCR work & splits
                                                     oversized docs]
      → union → groupBy(doc_id).collect_list       [shuffle #2]
      → array_sort + transform(order)              [narrow]

Scale design notes (100 TB / 1000 executors):

* Exploding to span rows BEFORE the expensive stage is the skew
  strategy: a 5,000-span document becomes 5,000 independent rows, so
  one giant doc can't pin a task (SURVEY.md §4 item 1 — AQE cannot
  split a single row). The OCR stage is repartitioned by
  ``hash(media_ref)`` which is near-uniform by construction.
* All non-media span logic is pure Catalyst (WholeStageCodegen): link
  density, anchor strip, squash, field-key dispatch normalization.
  Python touches ONLY media spans, Arrow-batched.
* Re-assembly is ONE hash shuffle on doc_id; collect_list +
  array_sort keeps per-doc state bounded by document size (documents
  are bounded; 10^12-doc scale comes from doc count, not doc size).
* No driver-side loops, no collect(), no per-row Python UDFs.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_intern_spark.functions.normalizers import (
    normalize_field,
    squash_spaces,
)
from ocr_intern_spark.schema import FLAT_DDL

LINK_DENSITY_CUTOFF = 1.0 / 3.0

_ANCHOR_INNER = r"(?s)<a\b[^>]*>(.*?)</a>"
_ANCHOR_TAGS = r"(?s)</?a\b[^>]*>"


def _linked_chars(text: Column) -> Column:
    """Total characters inside <a>…</a> anchors — native HOF."""
    inners = F.regexp_extract_all(text, F.lit(_ANCHOR_INNER), 1)
    return F.aggregate(inners, F.lit(0), lambda acc, x: acc + F.length(x))


def _clean_text(text: Column) -> Column:
    return squash_spaces(F.regexp_replace(text, _ANCHOR_TAGS, ""))


def explode_spans(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.posexplode("spans").alias("pos", "s")
    ).select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        "pos",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )


def transform_plain_spans(flat: DataFrame) -> DataFrame:
    """Everything except media OCR — pure Catalyst expressions.

    text: boilerplate/link-density strip (spec step 2-3);
    heading: squash (step 4); field: key-dispatch normalize (step 5);
    media with missing ref: error capture (step 6a).
    """
    text = F.col("text")
    density_drop = (
        _linked_chars(text).cast("double") / F.length(text)
    ) > F.lit(LINK_DENSITY_CUTOFF)
    cleaned = _clean_text(text)

    key = F.trim(F.substring_index(text, ":", 1))
    raw = F.when(
        F.instr(text, ":") > 0,
        F.trim(F.expr("substring(text, instr(text, ':') + 1)")),
    ).otherwise(F.lit(""))
    # no ':' → whole text is the value, key is ''
    fkey = F.when(F.instr(text, ":") > 0, key).otherwise(F.lit(""))
    fraw = F.when(F.instr(text, ":") > 0, raw).otherwise(F.trim(text))
    fvalue = normalize_field(fkey, fraw)["value"]

    out_text = (
        F.when(F.col("kind") == "text", cleaned)
        .when(F.col("kind") == "heading", squash_spaces(text))
        .when(F.col("kind") == "field", F.concat(fkey, F.lit("="), fvalue))
        .when(F.col("kind") == "media", F.lit("missing media_ref"))
    )
    out_kind = F.when(F.col("kind") == "media", F.lit("error")).otherwise(
        F.col("kind")
    )

    keep = (
        ((F.col("kind") == "text") & ~density_drop & (F.length(cleaned) > 0))
        | ((F.col("kind") == "heading") & (F.length(squash_spaces(text)) > 0))
        | (F.col("kind") == "field")
        | (
            (F.col("kind") == "media")
            & ((F.col("media_ref").isNull()) | (F.col("media_ref") == ""))
        )
    )
    return flat.where(keep).select(
        "doc_id",
        "offset",
        "pos",
        F.lit(0).alias("seq"),
        out_kind.alias("kind"),
        out_text.alias("text"),
        F.lit("").alias("media_ref"),
    )


# ---------------------------------------------------------------------------
# Media OCR stage — the one mapInPandas stage (Arrow-batched).
# ---------------------------------------------------------------------------

_AR_RANGE = re.compile("[؀-ۿ]")
_LATIN = re.compile("[a-zA-Z]")

Recognizer = Callable[[str], Iterable[Any]]


def _fuse_tokens(toks: list[Any]) -> list[tuple[str, str]]:
    """Hybrid fusion for ONE media ref, numpy-vectorized.

    Independent reimplementation of parse-filter → F1 → F4 → R2
    (hybrid.py:27-128, reading_order.py:44-59); the oracle implements
    the same spec with reference-shaped Python loops.
    Returns [(kind, text)] in reading order.
    """
    if not toks:
        return []
    text = np.array([(t.text or "") for t in toks], dtype=object)
    conf = np.array([t.conf for t in toks], dtype=np.float64)
    x = np.array([t.x for t in toks], dtype=np.int64)
    y = np.array([t.y for t in toks], dtype=np.int64)
    w = np.array([t.w for t in toks], dtype=np.int64)
    h = np.array([t.h for t in toks], dtype=np.int64)
    lang = np.array([t.lang for t in toks], dtype=object)

    stripped = np.array([s.strip() for s in text], dtype=object)
    parse_ok = (stripped != "") & (conf >= 0)
    has_ar = np.array([bool(_AR_RANGE.search(s)) for s in text])
    has_lat = np.array([bool(_LATIN.search(s)) for s in text])
    ar_m = parse_ok & (lang == "ara") & has_ar
    fr_m = parse_ok & (lang == "fra") & has_lat

    ai = np.flatnonzero(ar_m)
    fi = np.flatnonzero(fr_m)

    # F4: overlap matrix (|ar| × |fr|), open-interval intersection
    if ai.size and fi.size:
        ov = (
            (x[ai][:, None] < (x[fi] + w[fi])[None, :])
            & ((x[ai] + w[ai])[:, None] > x[fi][None, :])
            & (y[ai][:, None] < (y[fi] + h[fi])[None, :])
            & ((y[ai] + h[ai])[:, None] > y[fi][None, :])
        )
        ar_drop = (ov & (conf[ai][:, None] <= conf[fi][None, :])).any(axis=1)
        ai_kept = ai[~ar_drop]
        if ai_kept.size:
            ov2 = (
                (x[ai_kept][:, None] < (x[fi] + w[fi])[None, :])
                & ((x[ai_kept] + w[ai_kept])[:, None] > x[fi][None, :])
                & (y[ai_kept][:, None] < (y[fi] + h[fi])[None, :])
                & ((y[ai_kept] + h[ai_kept])[:, None] > y[fi][None, :])
            )
            fr_drop = (ov2 & (conf[fi][None, :] < conf[ai_kept][:, None])).any(axis=0)
        else:
            fr_drop = np.zeros(fi.size, dtype=bool)
        fi_kept = fi[~fr_drop]
    else:
        ai_kept, fi_kept = ai, fi

    # merged order = arabic then french (flatten_results dict order)
    merged = np.concatenate([ai_kept, fi_kept]) if ai_kept.size or fi_kept.size else np.array([], dtype=np.int64)
    if merged.size == 0:
        return []

    line = y[merged] // np.maximum(1, h[merged])
    is_ar_tok = np.array([str(s).lower().startswith("arab") or s == "ara" for s in lang[merged]])
    # RTL vote per line: strict majority of arabic tokens
    df = pd.DataFrame({"line": line, "ar": is_ar_tok, "x": x[merged]})
    grp = df.groupby("line")["ar"]
    rtl = (grp.transform("sum") > grp.transform("size") / 2).to_numpy()
    signed_x = np.where(rtl, -df["x"].to_numpy(), df["x"].to_numpy())
    # stable lexsort: primary=line, secondary=signed_x, ties keep
    # merged (arabic-then-french, insertion) order
    perm = np.lexsort((signed_x, line))
    ordered = merged[perm]
    return [("ocr", str(text[j]).strip()) for j in ordered]


def make_ocr_stage(
    recognize: Recognizer,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """mapInPandas function: (doc_id, offset, pos, media_ref) batches →
    FLAT_DDL rows, one per surviving OCR token, seq = reading order."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "offset": [], "pos": [], "seq": [],
                "kind": [], "text": [], "media_ref": [],
            }
            for doc_id, offset, pos, ref in zip(
                pdf["doc_id"], pdf["offset"], pdf["pos"], pdf["media_ref"]
            ):
                toks = list(recognize(ref))
                for seq, (kind, txt) in enumerate(_fuse_tokens(toks)):
                    out["doc_id"].append(doc_id)
                    out["offset"].append(offset)
                    out["pos"].append(pos)
                    out["seq"].append(seq)
                    out["kind"].append(kind)
                    out["text"].append(txt)
                    out["media_ref"].append(ref)
            yield pd.DataFrame(out)

    return stage


def ocr_media_spans(
    flat: DataFrame, recognize: Recognizer, ocr_partitions: int | None = None
) -> DataFrame:
    media = flat.where(
        (F.col("kind") == "media")
        & F.col("media_ref").isNotNull()
        & (F.col("media_ref") != "")
    ).select("doc_id", "offset", "pos", "media_ref")
    if ocr_partitions:
        # balance recognizer work independent of document skew
        media = media.repartition(ocr_partitions, F.hash("media_ref"))
    return media.mapInPandas(make_ocr_stage(recognize), schema=FLAT_DDL)


def assemble(flat_out: DataFrame) -> DataFrame:
    """Re-assemble per-document span arrays with the final 0-based
    ``order`` (spec step 7). One hash shuffle; sort key
    (offset, pos, seq) reproduces the oracle's stable emission order."""
    return (
        flat_out.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("offset", "pos", "seq", "kind", "text", "media_ref")
                )
            ).alias("arr")
        )
        .select(
            "doc_id",
            F.expr(
                "transform(arr, (e, i) -> struct("
                "e.kind as kind, e.text as text, "
                "e.media_ref as media_ref, cast(i as int) as `order`))"
            ).alias("spans"),
        )
    )


def extract(
    docs: DataFrame,
    recognize: Recognizer,
    ocr_partitions: int | None = None,
) -> DataFrame:
    """documents(doc_id, spans[kind,text,media_ref,offset]) →
    extracted(doc_id, spans[kind,text,media_ref,order]).

    Every input doc_id appears in the output exactly once — docs whose
    spans are all dropped (or null/empty input arrays) get an empty
    span array. Required for idempotent checkpoint/resume: the
    anti-join against the extracted table must see every processed
    doc (SURVEY.md §4 item 3).
    """
    flat = explode_spans(docs)
    plain = transform_plain_spans(flat)
    ocr = ocr_media_spans(flat, recognize, ocr_partitions=ocr_partitions)
    assembled = assemble(plain.unionByName(ocr))
    empty = F.array().cast(assembled.schema["spans"].dataType)
    return (
        docs.select("doc_id")
        .join(assembled, "doc_id", "left")
        .select("doc_id", F.coalesce("spans", empty).alias("spans"))
    )


def classify_documents(extracted: DataFrame) -> DataFrame:
    """A1: join span texts per doc (already in reading order) and run
    the keyword cascade — fully native."""
    from ocr_intern_spark.functions.normalizers import classify_doc_type

    joined = F.array_join(F.expr("transform(spans, s -> s.text)"), " ")
    return extracted.select(
        "doc_id", classify_doc_type(joined).alias("doc_type")
    )
