"""City-directory seed workflow: scrape the site directory into the
``cities`` lookup dimension.

Mirrors the reference's ``--fetch-cities`` admin path
(scrapers/vgsi/source.py: fetch_vgsi_cities :706-737, store_cities
:739-766, run_admin :968-977): fetch the public directory page, extract
every ``gis.vgsi.com``-style city link, derive ``city_key``/``state``
from the hostname token, and upsert into the cities dimension keyed by
``city_key`` (newest wins — the reference's ``ON CONFLICT DO UPDATE``).

Spark-first shape: the directory page is ONE small HTML document, so
parsing is plain driver-side regex (no BeautifulSoup dependency); the
upsert goes through :class:`LookupDimension`, whose rewrite is O(dim
size) and atomic. A JSON seed file (the ``vgsi_cities_ct.json``
equivalent) can stand in for the network fetch — same rows, same upsert.

The fetch boundary is injected (``fetcher: url -> html``) so everything
here runs offline; the CLI wires a urllib fetcher.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ctcityscraper_spark.sources.lookup import LookupDimension

DEFAULT_DIRECTORY_URL = "https://www.vgsi.com/vision-client-community-portal/"

# href of an anchor pointing at a gis.vgsi.com city site (either quoting
# style — CMS templates flip between them), and the anchor text (the
# display name). The reference matches the same hrefs via BeautifulSoup
# find_all(href=re.compile(r"https://gis\.vgsi\.com/")).
_LINK_RE = re.compile(
    r'<a\b[^>]*href=["\'](https://gis\.vgsi\.com/[^"\']*)["\'][^>]*>(.*?)</a>',
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(r"<[^>]+>")
# the reference's city-token regex verbatim (vgsi/source.py:722): a word
# token ending in the state code; key is the token minus the trailing code
_CITY_TOKEN_RE = re.compile(r"([\w]{2,}([cC][Tt])+)")

CITIES_SCHEMA = (
    "city_key string, city_name string, state string, url string, type string"
)


def parse_city_links(html: str) -> dict[str, dict]:
    """Extract ``{city_key: {city_name, state, url, type}}`` from the
    directory page HTML.

    Same semantics as the reference parse (vgsi/source.py:719-734): for
    each gis.vgsi.com link, the first ``\\w``-token ending in the state
    code yields ``city_key`` (token minus code) and ``state`` (the code,
    lowercased); the anchor text, tag-stripped, is the display name.
    Later links win on key collision, like dict assignment there.
    """
    cities: dict[str, dict] = {}
    for href, inner in _LINK_RE.findall(html):
        m = _CITY_TOKEN_RE.search(href)
        if not m:
            continue
        location = m.group(1).lower()
        cities[location[:-2]] = {
            "city_name": _TAG_RE.sub("", inner).strip(),
            "state": location[-2:],
            "url": href,
            "type": "vgsi",
        }
    return cities


def fetch_cities(
    fetcher: Callable[[str], str], url: str = DEFAULT_DIRECTORY_URL
) -> dict[str, dict]:
    """Fetch + parse the directory page (reference fetch_vgsi_cities)."""
    return parse_city_links(fetcher(url))


def load_cities_seed(path: str | Path) -> dict[str, dict]:
    """Read a cities seed JSON — either the ``{city_key: {...}}`` mapping
    shape this module produces, or a list of row dicts with a
    ``city_key`` field."""
    data = json.loads(Path(path).read_text())
    if isinstance(data, list):
        return {row["city_key"]: {k: v for k, v in row.items() if k != "city_key"}
                for row in data}
    return data


def cities_to_df(spark: SparkSession, cities: dict[str, dict]) -> DataFrame:
    """``{city_key: info}`` -> one-row-per-city DataFrame (CITIES_SCHEMA)."""
    rows = [
        (
            key,
            info.get("city_name"),
            info.get("state"),
            info.get("url"),
            info.get("type", "vgsi"),
        )
        for key, info in sorted(cities.items())
    ]
    return spark.createDataFrame(rows, CITIES_SCHEMA)


def cities_dimension(spark: SparkSession, data_dir: str | Path) -> LookupDimension:
    """The canonical cities dim location under a data dir (the reference's
    ``main.cities`` table equivalent)."""
    return LookupDimension(spark, Path(data_dir) / "_dims" / "cities", key="city_key")


def store_cities(
    spark: SparkSession, data_dir: str | Path, cities: dict[str, dict]
) -> int:
    """Upsert parsed cities into the dimension; returns stored city count
    (reference store_cities returns the upserted count)."""
    dim = cities_dimension(spark, data_dir)
    dim.upsert(cities_to_df(spark, cities))
    return len(cities)


def city_url(spark: SparkSession, data_dir: str | Path, city_key: str) -> str | None:
    """Point lookup of a city's base URL (reference get_city_url)."""
    dim = cities_dimension(spark, data_dir)
    if not dim.exists():
        return None
    return dim.lookup(city_key, "url")
