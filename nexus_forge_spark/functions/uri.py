"""URI rewriting for store file/resource addresses (S18).

Reference behavior: BlueBrainNexus.rewrite_uri_static
(kgforge/specializations/stores/bluebrain_nexus.py:1249-1301) — a
curie-schema'd or bare id is rewritten into the store's
``<endpoint>/{files|resources}/<bucket>/...`` address form, expanding the
schema curie through the JSON-LD context, resolving relative ids against
@base, and percent-encoding expanded segments.  Behavior is pinned by the
reference's own golden matrix (tests/specializations/stores/
test_bluebrain_nexus.py:343-418), reproduced in tests/test_uri.py.

This is driver-side metadata work (one URL at a time when building a
download/register request), so plain Python is the right altitude — the
bulk data path never goes through here.
"""

from __future__ import annotations

import re
from urllib.parse import quote_plus, unquote, urljoin, urlparse

from nexus_forge_spark.operators.convert import expand_iri

# a path segment of the form /prefix:local/ somewhere inside the URI
# (schema curies; URL schemes don't match because '//' follows their colon)
_CURIE_SEGMENT = re.compile(r"[\w\.:%/-]+/(\w+):(\w+)/[\w\.\-/:%]+")


def _is_absolute_url(value: str) -> bool:
    try:
        parts = urlparse(value)
        return bool(parts.scheme) and bool(parts.netloc)
    except ValueError:
        return False


def _resolve_id(value: str, context: dict | None) -> str:
    """Relative id -> IRI against the context @base (Context.resolve_iri)."""
    if _is_absolute_url(value):
        return value
    ctx = (context or {}).get("@context", context or {})
    base = ctx.get("@base")
    if base:
        return urljoin(base if base.endswith("/") else base + "/", value)
    return value


def rewrite_uri(
    endpoint: str,
    bucket: str,
    uri: str,
    context: dict | None,
    is_file: bool = True,
    encoding: str | None = None,
) -> str:
    """Rewrite ``uri`` into the store's address space (see module doc)."""
    raw = unquote(uri)
    kind = "files" if is_file else "resources"
    url_base = "/".join([endpoint, kind, bucket])

    m = _CURIE_SEGMENT.match(raw)
    if m:
        prefix, local = m.group(1), m.group(2)
        curie = f"{prefix}:{local}"
        resolved_schema = expand_iri(prefix, context)
        if raw.startswith(url_base):
            extended = resolved_schema + local
            url = raw.replace(curie, quote_plus(extended))
            schema_and_id = url.split(url_base + "/")[1]
            id_ = schema_and_id.split(quote_plus(extended) + "/")[-1]
            resolved_id = _resolve_id(id_, context)
            return url.replace(id_, quote_plus(resolved_id))
        url = raw.replace(curie, resolved_schema + local)
    else:
        url = raw

    if url.startswith(url_base):
        schema_and_id = url.split(url_base)[1]
        if "/_/" in schema_and_id:
            id_ = schema_and_id.split("/_/")[-1]
        else:
            id_ = schema_and_id.split("/")[-1]
        resolved_id = _resolve_id(id_, context)
        if resolved_id in schema_and_id:
            return uri  # already in expanded form — hand back as given
        return url.replace(id_, quote_plus(resolved_id))

    if not is_file and "/_/" not in url:
        return "/".join((url_base, "_", quote_plus(url, encoding=encoding)))
    return "/".join((url_base, quote_plus(url, encoding=encoding)))
