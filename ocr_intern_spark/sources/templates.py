"""Template configuration: the reference's full 5-template set (S3)
plus per-document template-type detection (A7) as a native Catalyst
expression.

The template data below is a constants-level port of
``assets/templates/morocco_templates.json`` in the reference — like
the validator regex/commune inventories, this config IS the pinned
semantics the rebuild must reproduce (region geometry, per-region OCR
options, section/field naming, required fields), not code. Loader
semantics follow ``TemplateExtractor._load_templates``
(/root/reference/src/ocr/template.py:47-85): regions are flattened in
JSON section order, every region keeps its optional OCR knobs.

Template-type detection follows ``OCRWorker._detect_template_type``
(/root/reference/src/gui/components/hybrid_ocr_gui.py:104-120): join
all recognized text, lowercase it, and return the FIRST template in
list order whose French name (lowercased) or Arabic name occurs as a
substring; otherwise ``"unknown"``. (The reference's TemplateManager
import is dead code — the class exists nowhere in the repo — so the
template list order is the JSON file order, the only order defined.)

At cluster scale the template dict is a few KB of driver-side config:
it rides into the Arrow stage closure exactly like the reference's
in-process template dict, and the detection cascade is a constant
chain of `contains` predicates — whole-stage-codegen'd, no UDF, no
join, no shuffle.
"""

from __future__ import annotations

from typing import Any, NamedTuple

from pyspark.sql import Column
from pyspark.sql import functions as F


class Region(NamedTuple):
    """One template region (reference TemplateRegion,
    src/ocr/template.py:11-26): relative geometry + OCR options."""

    section: str
    name: str
    x: float
    y: float
    w: float
    h: float
    lang: str | None = None
    psm: int | None = None
    oem: int | None = None
    dpi: int | None = None
    scale: float | None = None
    whitelist: str | None = None
    preserve_spaces: bool | None = None

    def opts(self) -> dict[str, Any]:
        """Region options dict in the shape build_engine_config /
        abs_region expect."""
        d: dict[str, Any] = {"x": self.x, "y": self.y, "w": self.w, "h": self.h}
        for k in ("lang", "psm", "oem", "dpi", "scale", "whitelist",
                  "preserve_spaces"):
            v = getattr(self, k)
            if v is not None:
                d[k] = v
        return d


class Template(NamedTuple):
    """Reference Template (src/ocr/template.py:29-37)."""

    template_id: str
    name: str
    name_ar: str
    version: str
    regions: tuple[Region, ...]
    required_fields: tuple[str, ...]

    def field_tuples(self) -> tuple[tuple[str, str, str | None], ...]:
        """(section, name, explicit_lang) triples in region order —
        the shape template_fields/oracle.template consume."""
        return tuple((r.section, r.name, r.lang) for r in self.regions)


def _r(section: str, name: str, d: dict[str, Any]) -> Region:
    return Region(
        section=section, name=name, x=d["x"], y=d["y"], w=d["w"], h=d["h"],
        lang=d.get("lang"), psm=d.get("psm"), oem=d.get("oem"),
        dpi=d.get("dpi"), scale=d.get("scale"), whitelist=d.get("whitelist"),
        preserve_spaces=d.get("preserve_spaces"),
    )


# assets/templates/morocco_templates.json, verbatim values, file order.
_RAW: dict[str, dict[str, Any]] = {
    "assoc_receipt": {
        "name": "Association Receipt – Casablanca",
        "name_ar": "وصل الإيداع – الدار البيضاء",
        "template_version": "1.0",
        "required_fields": [
            "title.fr", "title.ar", "header.commune.fr",
            "body.association_name.fr", "body.receipt_no", "body.date.fr",
        ],
        "regions": {
            "title": {
                "fr": {"x": 0.08, "y": 0.08, "w": 0.84, "h": 0.08,
                       "lang": "french", "psm": 7, "dpi": 300},
                "ar": {"x": 0.08, "y": 0.16, "w": 0.84, "h": 0.09,
                       "lang": "arabic", "psm": 7, "dpi": 300,
                       "preserve_spaces": True},
            },
            "header": {
                "commune.fr": {"x": 0.08, "y": 0.26, "w": 0.40, "h": 0.06,
                               "lang": "french", "psm": 7, "dpi": 300},
                "commune.ar": {"x": 0.52, "y": 0.26, "w": 0.40, "h": 0.06,
                               "lang": "arabic", "psm": 7, "dpi": 300,
                               "preserve_spaces": True},
            },
            "body": {
                "association_name.fr": {"x": 0.10, "y": 0.45, "w": 0.80,
                                        "h": 0.08, "lang": "french",
                                        "psm": 7, "scale": 1.25},
                "association_name.ar": {"x": 0.10, "y": 0.54, "w": 0.80,
                                        "h": 0.08, "lang": "arabic",
                                        "psm": 7, "scale": 1.25,
                                        "preserve_spaces": True},
                "receipt_no": {"x": 0.10, "y": 0.64, "w": 0.40, "h": 0.07,
                               "lang": "french", "psm": 7, "dpi": 300,
                               "scale": 1.35, "whitelist": "0123456789/-",
                               "preserve_spaces": True},
                "date.fr": {"x": 0.55, "y": 0.64, "w": 0.35, "h": 0.07,
                            "lang": "french", "psm": 7},
            },
            "footer": {},
        },
    },
    "certificat_residence": {
        "name": "Certificat de Résidence",
        "name_ar": "شهادة السكنى",
        "template_version": "2.0",
        "required_fields": ["full_name", "cin", "address", "issue_date"],
        "regions": {
            "header": {
                "kingdom": {"x": 0.4, "y": 0.1, "w": 0.2, "h": 0.05},
                "ministry": {"x": 0.35, "y": 0.15, "w": 0.3, "h": 0.05},
                "prefecture": {"x": 0.3, "y": 0.2, "w": 0.4, "h": 0.05},
            },
            "title": {
                "fr": {"x": 0.35, "y": 0.3, "w": 0.3, "h": 0.06},
                "ar": {"x": 0.35, "y": 0.36, "w": 0.3, "h": 0.06},
            },
            "content": {
                "main_text": {"x": 0.1, "y": 0.45, "w": 0.8, "h": 0.3},
                "signature": {"x": 0.6, "y": 0.8, "w": 0.3, "h": 0.15},
                "stamp": {"x": 0.65, "y": 0.75, "w": 0.2, "h": 0.2},
            },
        },
    },
    "attestation_administrative": {
        "name": "Attestation Administrative",
        "name_ar": "شهادة إدارية",
        "template_version": "2.0",
        "required_fields": ["full_name", "cin", "purpose", "issue_date"],
        "regions": {
            "header": {
                "kingdom": {"x": 0.4, "y": 0.1, "w": 0.2, "h": 0.05},
                "ministry": {"x": 0.35, "y": 0.15, "w": 0.3, "h": 0.05},
                "prefecture": {"x": 0.3, "y": 0.2, "w": 0.4, "h": 0.05},
            },
            "title": {
                "fr": {"x": 0.35, "y": 0.3, "w": 0.3, "h": 0.06},
                "ar": {"x": 0.35, "y": 0.36, "w": 0.3, "h": 0.06},
            },
            "content": {
                "main_text": {"x": 0.1, "y": 0.45, "w": 0.8, "h": 0.3},
                "signature": {"x": 0.6, "y": 0.8, "w": 0.3, "h": 0.15},
                "stamp": {"x": 0.65, "y": 0.75, "w": 0.2, "h": 0.2},
            },
        },
    },
    "autorisation_construction": {
        "name": "Autorisation de Construction",
        "name_ar": "رخصة البناء",
        "template_version": "2.0",
        "required_fields": [
            "permit_number", "issue_date", "property_address",
            "title_deed_number", "area", "construction_type",
        ],
        "regions": {
            "header": {
                "kingdom": {"x": 0.4, "y": 0.1, "w": 0.2, "h": 0.05},
                "ministry": {"x": 0.35, "y": 0.15, "w": 0.3, "h": 0.05},
                "prefecture": {"x": 0.3, "y": 0.2, "w": 0.4, "h": 0.05},
            },
            "permit_details": {
                "number": {"x": 0.1, "y": 0.3, "w": 0.3, "h": 0.05},
                "date": {"x": 0.5, "y": 0.3, "w": 0.3, "h": 0.05},
            },
            "property_info": {
                "address": {"x": 0.1, "y": 0.4, "w": 0.8, "h": 0.1},
                "title_deed": {"x": 0.1, "y": 0.5, "w": 0.4, "h": 0.05},
            },
            "specifications": {
                "area": {"x": 0.1, "y": 0.6, "w": 0.3, "h": 0.05},
                "type": {"x": 0.5, "y": 0.6, "w": 0.3, "h": 0.05},
            },
            "approval": {
                "signature": {"x": 0.6, "y": 0.8, "w": 0.3, "h": 0.15},
                "stamp": {"x": 0.65, "y": 0.75, "w": 0.2, "h": 0.2},
            },
        },
    },
    "extrait_naissance": {
        "name": "Extrait de Naissance",
        "name_ar": "نسخة موجزة من رسم الولادة",
        "template_version": "2.0",
        "required_fields": [
            "registry_year", "registry_number", "full_name", "birth_date",
            "birth_place", "father_name", "mother_name",
        ],
        "regions": {
            "header": {
                "kingdom": {"x": 0.4, "y": 0.1, "w": 0.2, "h": 0.05},
                "ministry": {"x": 0.35, "y": 0.15, "w": 0.3, "h": 0.05},
            },
            "registry_info": {
                "year": {"x": 0.1, "y": 0.25, "w": 0.2, "h": 0.05},
                "number": {"x": 0.4, "y": 0.25, "w": 0.2, "h": 0.05},
            },
            "personal_info": {
                "name": {"x": 0.1, "y": 0.35, "w": 0.8, "h": 0.05},
                "birth_date": {"x": 0.1, "y": 0.45, "w": 0.4, "h": 0.05},
                "birth_place": {"x": 0.1, "y": 0.55, "w": 0.4, "h": 0.05},
                "parents": {"x": 0.1, "y": 0.65, "w": 0.8, "h": 0.1},
            },
            "certification": {
                "signature": {"x": 0.6, "y": 0.8, "w": 0.3, "h": 0.15},
                "stamp": {"x": 0.65, "y": 0.75, "w": 0.2, "h": 0.2},
            },
        },
    },
}


def load_templates() -> dict[str, Template]:
    """All 5 production templates, flattened region lists in section →
    field order (the reference loader's iteration order)."""
    out: dict[str, Template] = {}
    for tid, td in _RAW.items():
        regions = tuple(
            _r(section, name, coords)
            for section, fields in td["regions"].items()
            for name, coords in fields.items()
        )
        out[tid] = Template(
            template_id=tid,
            name=td["name"],
            name_ar=td["name_ar"],
            version=td["template_version"],
            regions=regions,
            required_fields=tuple(td["required_fields"]),
        )
    return out


TEMPLATES: dict[str, Template] = load_templates()


def detect_template_type(joined_text: Column) -> Column:
    """A7: first template (file order) whose lowercased French name or
    Arabic name occurs in the lowercased document text, else
    'unknown' (hybrid_ocr_gui.py:104-120). Constant when-cascade of
    `contains` — codegen'd, no UDF."""
    low = F.lower(joined_text)
    expr = F.lit("unknown")
    for tid, t in reversed(list(TEMPLATES.items())):
        hit = F.contains(low, F.lit(t.name.lower())) | F.contains(
            low, F.lit(t.name_ar)
        )
        expr = F.when(hit, F.lit(tid)).otherwise(expr)
    return expr
