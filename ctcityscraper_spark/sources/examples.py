"""Example source: a property-record HTML scraper in the reference's shape.

Demonstrates the full SourceDefinition surface on the reference's data model
(scrapers/vgsi/source.py): one fetched page fans out to parent + child
tables (properties, buildings, sub_areas), money/int coercions happen at
ingest, unknown fields are captured into the ``extra_fields`` JSON column
so "new fields added later are never silently lost" (reference :284-286),
and entity identity is the deterministic md5 UUID.

Parsing is dependency-free (regex over a simple ``<span id>``/table HTML
dialect) and the fetch boundary is injected, so the example runs offline;
swap ``page_source`` for a urllib fetcher against a real site.
"""

from __future__ import annotations

import hashlib
import json
import re
from typing import Callable

from ctcityscraper_spark.sources.contracts import InvalidEntryError, SourceDefinition

# field -> span id, mirroring the reference's PROPERTY_TAGS mapping concept
PROPERTY_SPANS = {
    "address": "MainContent_lblLocation",
    "owner": "MainContent_lblOwner",
    "sale_price": "MainContent_lblPrice",
    "assessment_value": "MainContent_lblAssess",
    "appraisal_value": "MainContent_lblAppraise",
    "building_count": "MainContent_lblBldCount",
}
MONEY_FIELDS = {"sale_price", "assessment_value", "appraisal_value"}
INT_FIELDS = {"building_count"}

_SPAN_RE = re.compile(r'<span id="([^"]+)">([^<]*)</span>')
_BUILDING_RE = re.compile(
    r'<div class="building" data-bid="(\d+)">(.*?)</div>', re.DOTALL
)
_ROW_RE = re.compile(r"<tr><td>([^<]*)</td><td>([^<]*)</td></tr>")
# 4-cell sub-area rows (code, description, gross, living) — the grdSub table
# dialect (reference _parse_sub_areas, vgsi/source.py:430-459)
_SUB_RE = re.compile(
    r'<tr class="sub"><td>([^<]*)</td><td>([^<]*)</td><td>([^<]*)</td><td>([^<]*)</td></tr>'
)


def _money(v: str) -> float | None:
    v = v.strip().replace("$", "").replace(",", "")
    try:
        return float(v) if v else None
    except ValueError:
        return None


def _int(v: str) -> int | None:
    try:
        return int(float(v.strip())) if v.strip() else None
    except ValueError:
        return None


def _clean(v: str) -> str | None:
    v = v.strip()
    return v or None


def entity_uuid(pid, data: dict) -> str:
    """Reference generate_uuid recipe (vgsi/source.py:182-194)."""
    h = hashlib.md5(
        f"{pid}{json.dumps(data, sort_keys=True, default=str)}".encode()
    ).hexdigest()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def parse_property_page(html: str, pid: int) -> dict:
    """One page -> property payload with nested buildings/sub_areas.

    Known spans land in typed fields; unknown spans land in ``extra_fields``
    (the reference's drift-capture policy, vgsi/source.py:301-312).
    """
    spans = {sid: val for sid, val in _SPAN_RE.findall(html)}
    id_to_field = {v: k for k, v in PROPERTY_SPANS.items()}
    prop: dict = {"pid": pid}
    extra: dict = {}
    for sid, raw in spans.items():
        field = id_to_field.get(sid)
        if field is None:
            if (v := _clean(raw)) is not None:
                extra[sid] = v
        elif field in MONEY_FIELDS:
            prop[field] = _money(raw)
        elif field in INT_FIELDS:
            prop[field] = _int(raw)
        else:
            prop[field] = _clean(raw)
    prop["extra_fields"] = json.dumps(extra, sort_keys=True) if extra else None

    buildings = []
    for bid, body in _BUILDING_RE.findall(html):
        b: dict = {"bid": int(bid)}
        for key, val in _ROW_RE.findall(body):
            k = key.strip().lower().replace("&", "and")
            k = re.sub(r"[\s:]+$", "", k)
            k = re.sub(r"\s+", "_", k)
            if k in ("replacement_cost", "building_value"):
                b[k] = _money(val)
            elif k in ("year_built", "living_area"):
                b[k] = _int(val.replace(",", ""))
            else:
                b[k] = _clean(val)
        # grandchild rows: empty code rows are skipped (reference :446-447)
        b["sub_areas"] = [
            {
                "code": code.strip(),
                "description": _clean(desc),
                "gross_area": _money(gross),
                "living_area": _money(living),
            }
            for code, desc, gross, living in _SUB_RE.findall(body)
            if code.strip()
        ]
        buildings.append(b)
    prop["buildings"] = buildings
    return prop


def flatten_property(payloads: list[dict]) -> dict[str, list[dict]]:
    """Payloads -> {properties, buildings, sub_areas} with FK stamping
    through both levels + uuid identity (reference flatten_vgsi,
    vgsi/source.py:587-639: sub_areas keyed by property_uuid+pid+bid,
    :626-634). First-seen uuid wins within a batch (D1 intra-batch dedup)."""
    props, bldgs, subs = [], [], []
    seen: set[str] = set()
    for p in payloads:
        data = {k: v for k, v in p.items() if k != "buildings"}
        uuid = entity_uuid(p["pid"], data)
        if uuid in seen:
            continue
        seen.add(uuid)
        props.append({"uuid": uuid, **data})
        for b in p.get("buildings", []):
            flat = {k: v for k, v in b.items() if k != "sub_areas"}
            bldgs.append({"property_uuid": uuid, "pid": p["pid"], **flat})
            for sa in b.get("sub_areas", []):
                subs.append(
                    {"property_uuid": uuid, "pid": p["pid"], "bid": b["bid"], **sa}
                )
    return {"properties": props, "buildings": bldgs, "sub_areas": subs}


def make_property_source(
    page_source: Callable[[str, int], str], name: str = "property_html"
) -> SourceDefinition:
    """Build the example source around an injected page fetcher.

    ``page_source(base_url, pid)`` returns HTML or raises InvalidEntryError.
    """

    def scrape(base_url: str, entry_id) -> dict:
        pid = int(entry_id)
        html = page_source(base_url, pid)
        if 'id="lblErrorMessage"' in html:  # invalid-entry detection pattern
            raise InvalidEntryError(f"pid {pid} does not exist")
        return parse_property_page(html, pid)

    return SourceDefinition(
        name=name,
        scrape_fn=scrape,
        flatten_fn=flatten_property,
        entry_id_source="properties/pid",
    )


def demo_page(base_url: str, pid: int) -> str:
    """Deterministic offline page generator for tests/demos."""
    if pid >= 900:
        return '<span id="lblErrorMessage">Record not found</span>'
    return f"""
    <span id="MainContent_lblLocation">{pid} ELM ST</span>
    <span id="MainContent_lblOwner">OWNER {pid}</span>
    <span id="MainContent_lblPrice">${100 + pid},500.00</span>
    <span id="MainContent_lblAssess">${200 + pid},000</span>
    <span id="MainContent_lblAppraise"></span>
    <span id="MainContent_lblBldCount">2</span>
    <span id="MainContent_lblZoning">R-{pid % 4}</span>
    <div class="building" data-bid="1">
      <table><tr><td>Year Built:</td><td>19{pid % 90:02d}</td></tr>
      <tr><td>Living Area:</td><td>1,2{pid % 90:02d}</td></tr>
      <tr><td>Replacement Cost:</td><td>$300,000</td></tr>
      <tr><td>Style</td><td>Colonial</td></tr></table>
      <table class="subareas">
      <tr class="sub"><td>FFL</td><td>First Floor</td><td>1,0{pid % 90:02d}</td><td>1,0{pid % 90:02d}</td></tr>
      <tr class="sub"><td>BMT</td><td>Basement</td><td>900</td><td>0</td></tr>
      <tr class="sub"><td></td><td>ignored empty code</td><td>1</td><td>1</td></tr>
      </table>
    </div>
    <div class="building" data-bid="2">
      <table><tr><td>Year Built:</td><td>1999</td></tr>
      <tr><td>Style</td><td>Garage</td></tr></table>
      <table class="subareas">
      <tr class="sub"><td>GAR</td><td>Garage Bay</td><td>400</td><td></td></tr>
      </table>
    </div>
    """
