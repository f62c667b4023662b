"""Template-field extraction operator (T3 + A2-A5, SURVEY.md §2.8).

Spark-side counterpart of ``ocr_intern_spark.oracle.template`` (the
spec, with reference citations). One Arrow-batched ``mapInPandas``
stage over media rows; per batch the recognizer runs once per
(media, template-field) region and the A2/A3 aggregates are computed
with vectorized pandas groupbys across the WHOLE batch. The A4/A5
candidate-selection step is per-field scalar decision logic (3
candidates max) evaluated from the precomputed aggregates.

Scale: same profile as the OCR stage — repartition media rows by
``hash(media_ref)``, one partition per Python worker slot; the
template (a handful of fields) rides inside the closure like the
reference's broadcast template config (SURVEY.md §1.1).
"""

from __future__ import annotations

import re
from typing import Callable, Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_intern_spark.oracle.template import DEFAULT_TEMPLATE, field_lang
from ocr_intern_spark.oracle.validators import normalize_field

FIELDS_DDL = (
    "doc_id string, media_ref string, field_key string, value string, "
    "norm string, valid boolean, type string, conf double, lang string"
)

_RECEIPT_FMT = re.compile(r"\d{4}/\d{3,5}")


def abs_region(
    height: int, width: int, rel: dict[str, float]
) -> tuple[int, int, int, int]:
    """T1: relative template region (0-1 floats) → absolute pixel box,
    clamped inside the image with a 1px minimum size — exact
    reproduction of TemplateExtractor._abs_box
    (template_extractor.py:108-119). Lives at the recognizer boundary:
    a real image engine crops ``image[y:y+h, x:x+w]`` from this before
    OCR; the deterministic stub addresses regions by name instead."""
    x = int(rel["x"] * width)
    y = int(rel["y"] * height)
    w = int(rel["w"] * width)
    h = int(rel["h"] * height)
    x = max(0, min(x, width - 1))
    y = max(0, min(y, height - 1))
    w = max(1, min(w, width - x))
    h = max(1, min(h, height - y))
    return x, y, w, h


_LATIN_LETTERS = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
)


def build_engine_config(rel: dict) -> str:
    """T2: assemble the per-region recognizer config string — exact
    reproduction of _build_tess_config (template_extractor.py:41-66),
    including the Arabic special case that APPENDS a second --oem and
    the Latin blacklist (the duplicate flag is reference behavior;
    tesseract takes the last occurrence). Recognizer-boundary utility:
    the pipeline itself never parses this string."""
    cfg: list[str] = []
    if (psm := rel.get("psm")) is not None:
        cfg += ["--psm", str(psm)]
    if (oem := rel.get("oem")) is not None:
        cfg += ["--oem", str(oem)]
    if (dpi := rel.get("dpi")) is not None:
        cfg += ["-c", f"user_defined_dpi={int(dpi)}"]
    if rel.get("preserve_spaces"):
        cfg += ["-c", "preserve_interword_spaces=1"]
    if wl := rel.get("whitelist"):
        cfg += ["-c", f"tessedit_char_whitelist={wl}"]
    if bl := rel.get("blacklist"):
        cfg += ["-c", f"tessedit_char_blacklist={bl}"]
    if rel.get("lang") == "arabic":
        cfg += [
            "--oem", "1",
            "-c", "preserve_interword_spaces=1",
            "-c", f"tessedit_char_blacklist={_LATIN_LETTERS}",
        ]
    return " ".join(cfg)


def _choose(group: pd.DataFrame, field_key: str) -> tuple[str, str, bool, str, float]:
    """A4 candidate scoring + A5 receipt boost from per-field
    aggregates (template_extractor.py:197-250)."""
    best_text = group["best_text"].iloc[0]
    base_conf = group["base_conf"].iloc[0]
    digit_conf = group["digit_conf"].iloc[0]
    joined = group["joined"].iloc[0]
    digits_only = re.sub(r"[^\d/-]+", "", joined)

    candidates: list[tuple[str, float]] = []
    if joined:
        candidates.append((joined, base_conf))
    if digits_only:
        candidates.append(
            (digits_only,
             (digit_conf if not np.isnan(digit_conf) else base_conf) + 0.1)
        )
    if best_text:
        candidates.append((best_text, base_conf))

    chosen_text, chosen_score = best_text, base_conf
    ctype, cvalue, cvalid = "text", "", False
    for txt, sc in candidates:
        nrm = normalize_field(field_key, txt)
        if (int(nrm.valid), sc, len(txt)) > (int(cvalid), chosen_score, len(chosen_text)):
            chosen_text, chosen_score = txt, sc
            ctype, cvalue, cvalid = nrm.type, nrm.value, nrm.valid

    if field_key.split(".")[-1] == "receipt_no":
        if not np.isnan(digit_conf) and _RECEIPT_FMT.fullmatch(chosen_text):
            conf = max(float(digit_conf) * 2.0, 40.0)
        elif not np.isnan(digit_conf):
            conf = float(digit_conf)
        else:
            conf = float(base_conf)
    else:
        conf = float(base_conf)
    return chosen_text, cvalue, bool(cvalid), ctype, conf


def make_fields_stage(
    recognize: Callable[[str], Iterable],
    template: tuple[tuple[str, str, str | None], ...] = DEFAULT_TEMPLATE,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tok_rows = []
            meta = []
            for rid, (doc_id, ref) in enumerate(zip(pdf["doc_id"], pdf["media_ref"])):
                for section, name, explicit in template:
                    key = f"{section}.{name}"
                    gid = len(meta)
                    meta.append((doc_id, ref, key, field_lang(section, name, explicit)))
                    for j, t in enumerate(recognize(f"{ref}#{key}")):
                        tok_rows.append(
                            (gid, j, t.text or "", float(t.conf),
                             max(1, int(t.w) * int(t.h)))
                        )
            out_cols = ["doc_id", "media_ref", "field_key", "value", "norm",
                        "valid", "type", "conf", "lang"]
            if not meta:
                yield pd.DataFrame({c: [] for c in out_cols})
                continue

            tf = pd.DataFrame(
                tok_rows, columns=["gid", "j", "text", "conf", "area"]
            )
            # A2: first strict argmax of conf*area, only if > 0
            if len(tf):
                tf["ca"] = tf["conf"] * tf["area"]
                grp = tf.groupby("gid", sort=False)
                best_idx = grp["ca"].idxmax()
                best = tf.loc[best_idx].set_index("gid")
                best_text = best["text"].where(best["ca"] > 0, "")
                # A3: interpolated medians (pandas median == statistics.median)
                conf_ok = tf[tf["conf"] >= 0]
                base_conf = conf_ok.groupby("gid")["conf"].median()
                digitish = conf_ok[
                    conf_ok["text"].str.contains(r"[\d/-]", regex=True)
                ]
                digit_conf = digitish.groupby("gid")["conf"].median()
                nonempty = tf[tf["text"] != ""]
                joined = nonempty.groupby("gid")["text"].agg(" ".join).str.strip()
            else:
                best_text = pd.Series(dtype=object)
                base_conf = pd.Series(dtype=float)
                digit_conf = pd.Series(dtype=float)
                joined = pd.Series(dtype=object)

            gids = pd.RangeIndex(len(meta))
            agg = pd.DataFrame(
                {
                    "best_text": best_text.reindex(gids, fill_value=""),
                    "base_conf": base_conf.reindex(gids).fillna(0.0),
                    "digit_conf": digit_conf.reindex(gids),
                    "joined": joined.reindex(gids, fill_value=""),
                },
                index=gids,
            )

            out = {c: [] for c in out_cols}
            for gid, (doc_id, ref, key, lang) in enumerate(meta):
                value, norm, valid, ftype, conf = _choose(
                    agg.iloc[[gid]], key
                )
                out["doc_id"].append(doc_id)
                out["media_ref"].append(ref)
                out["field_key"].append(key)
                out["value"].append(value)
                out["norm"].append(norm)
                out["valid"].append(valid)
                out["type"].append(ftype)
                out["conf"].append(conf)
                out["lang"].append(lang)
            yield pd.DataFrame(out)

    return stage


def template_fields(
    docs: DataFrame,
    recognize: Callable[[str], Iterable],
    template: tuple[tuple[str, str, str | None], ...] = DEFAULT_TEMPLATE,
    partitions: int | None = None,
) -> DataFrame:
    """documents(doc_id, spans) → one row per (media span, template
    field) with the normalized field record."""
    p = partitions or docs.sparkSession.sparkContext.defaultParallelism
    media = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .where((F.col("s.kind") == "media") & (F.col("s.media_ref") != ""))
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
        .repartition(p, F.hash("media_ref"))
    )
    return media.mapInPandas(make_fields_stage(recognize, template), schema=FIELDS_DDL)
