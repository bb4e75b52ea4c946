"""Out-of-band ingest: paginated ArcGIS/ONS GeoJSON fetch -> local file.

Closes the S4/S5 loop from SURVEY.md §2.1: the reference pages through an
ArcGIS feature API with resultOffset/resultRecordCount=2000 until
``exceededTransferLimit`` is false (/root/reference/geocode/utilities.py:292-316)
and retries plain GETs 3 times (utilities.py:319-332). The engine itself
reads only tables; this driver-side script lands the FeatureCollection that
``geocode_spark.jobs prepare_regions`` turns into prepared artifacts:

    python scripts/fetch_ons_geojson.py --url '<arcgis query url>' \
        --out boundaries.geojson
    python -m geocode_spark.jobs prepare_regions --infile boundaries.geojson \
        --outfile /dev/null --name llsoa --id-property LSOA21CD

Network access is gated behind an import-try (the build sandbox has none);
``paginate`` takes an injectable ``fetch`` callable so the pagination/retry
logic is unit-testable offline (tests/test_loaders.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

PAGE_SIZE = 2000  # utilities.py:300 resultRecordCount
MAX_RETRIES = 3   # utilities.py:325


def fetch_with_retry(url: str, fetch=None, retries: int = MAX_RETRIES,
                     backoff: float = 1.0):
    """S5: GET with up to ``retries`` attempts (utilities.py:319-332)."""
    if fetch is None:
        try:
            import urllib.request

            def fetch(u):  # pragma: no cover - needs network
                with urllib.request.urlopen(u, timeout=60) as r:
                    return json.loads(r.read().decode("utf-8"))
        except ImportError as ex:  # pragma: no cover
            raise RuntimeError("no HTTP client available") from ex
    last = None
    for attempt in range(retries):
        try:
            return fetch(url)
        except Exception as ex:  # noqa: BLE001 - retry any transport error
            last = ex
            if attempt < retries - 1:  # no pointless sleep after final try
                time.sleep(backoff * (attempt + 1))
    raise RuntimeError(f"fetch failed after {retries} attempts: {last}")


def paginate(base_url: str, fetch=None, page_size: int = PAGE_SIZE,
             max_pages: int = 10_000) -> dict:
    """S4: page with resultOffset until exceededTransferLimit is falsy
    (utilities.py:292-316); returns one merged FeatureCollection.

    Bounded: an endpoint that keeps asserting exceededTransferLimit while
    returning no features (cached error page, hard server cap) terminates
    instead of spinning forever."""
    features = []
    offset = 0
    for _ in range(max_pages):
        sep = "&" if "?" in base_url else "?"
        url = (f"{base_url}{sep}resultOffset={offset}"
               f"&resultRecordCount={page_size}")
        page = fetch_with_retry(url, fetch=fetch)
        got = page.get("features", [])
        features.extend(got)
        if not page.get("exceededTransferLimit", False) or not got:
            break
        # advance by what the server actually returned: endpoints cap pages
        # at their own maxRecordCount regardless of resultRecordCount, and
        # stepping by the REQUESTED size would silently skip records
        offset += len(got)
    else:
        raise RuntimeError(
            f"paginate exceeded {max_pages} pages without completion")
    return {"type": "FeatureCollection", "features": features}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="fetch_ons_geojson")
    p.add_argument("--url", required=True,
                   help="ArcGIS query URL returning GeoJSON (f=geojson)")
    p.add_argument("--out", required=True, help="output .geojson path")
    args = p.parse_args(argv)
    fc = paginate(args.url)
    with open(args.out, "w", encoding="utf-8") as fh:
        json.dump(fc, fh)
    print(f"wrote {len(fc['features'])} features to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
