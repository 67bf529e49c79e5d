"""Connector metadata routing — the deterministic layer of the
Google Drive connector (app/connectors/google_drive_connector.py)
shared in part with the Notion connector.

- ``SUPPORTED_MIME_TYPES`` (:40-49) and
  ``GOOGLE_DOCS_EXPORT_FORMATS`` (:51-55): which MIME types the
  connector ingests and how Google-native docs export.
- ``should_send_to_llamaparse`` (:441-461): PDF/Office MIME whitelist
  routing to the external parser.
- text decodability (:394-399): only text/plain, text/markdown,
  text/csv attempt UTF-8 decode.
- ``get_access_level`` (:463-479, identical map in
  notion_connector.py:660-676): public 1 → management 5, unknown
  defaults to employee (4).
- ``scan_drive`` file-type selection (:481-536): extension match on
  ``os.path.splitext(name)`` lowercased, plus pseudo-extensions
  .gdoc/.gsheet/.gslides selecting the Google-native MIME types.

All pure single-scan expressions; the listing-table shape is the
same change-capture contract as ``sources/polling.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SUPPORTED_MIME_TYPES = {
    'application/pdf': '.pdf',
    'application/vnd.openxmlformats-officedocument.wordprocessingml.document': '.docx',
    'application/msword': '.doc',
    'text/plain': '.txt',
    'text/markdown': '.md',
    'application/vnd.google-apps.document': '.gdoc',
    'application/vnd.google-apps.spreadsheet': '.gsheet',
    'application/vnd.google-apps.presentation': '.gslides',
}

GOOGLE_DOCS_EXPORT_FORMATS = {
    'application/vnd.google-apps.document': 'text/plain',
    'application/vnd.google-apps.spreadsheet': 'text/csv',
    'application/vnd.google-apps.presentation': 'text/plain',
}

LLAMAPARSE_MIME_TYPES = [
    'application/pdf',
    'application/vnd.openxmlformats-officedocument.wordprocessingml.document',
    'application/msword',
    'application/vnd.openxmlformats-officedocument.spreadsheetml.sheet',
    'application/vnd.ms-excel',
    'application/vnd.openxmlformats-officedocument.presentationml.presentation',
    'application/vnd.ms-powerpoint',
]

TEXT_DECODABLE_MIME_TYPES = ['text/plain', 'text/markdown', 'text/csv']

ACCESS_LEVELS = {
    "public": 1, "client": 2, "partner": 3, "employee": 4, "management": 5,
}
DEFAULT_ACCESS_LEVEL = 4  # .get(level, 4)

GDOC_PSEUDO_EXTENSIONS = {
    ".gdoc": "application/vnd.google-apps.document",
    ".gsheet": "application/vnd.google-apps.spreadsheet",
    ".gslides": "application/vnd.google-apps.presentation",
}


def _map_case(col: Column, mapping: dict, default) -> Column:
    out = None
    for k, v in mapping.items():
        arm = (col == k, F.lit(v))
        out = F.when(*arm) if out is None else out.when(*arm)
    return out.otherwise(F.lit(default))


def file_extension(name: Column) -> Column:
    """``os.path.splitext(name)[1]`` for slash-free names: the suffix
    from the LAST dot, '' when the only dot leads the name or there
    is none."""
    ext = F.regexp_extract(name, r"(\.[^.]*)$", 1)
    return F.when(ext == name, F.lit("")).otherwise(ext)


def access_level(security: Column) -> Column:
    return _map_case(security, ACCESS_LEVELS, DEFAULT_ACCESS_LEVEL).cast(
        "long"
    )


def annotate_routing(listing: DataFrame, mime_col: str = "mime_type",
                     name_col: str = "name") -> DataFrame:
    """Adds the connector's routing columns: ``ext``, ``supported``,
    ``dest_ext``, ``export_format``, ``send_to_llamaparse``,
    ``text_decodable``."""
    mime = F.col(mime_col)
    return listing.withColumns(
        {
            "ext": F.lower(file_extension(F.col(name_col))),
            "supported": mime.isin(list(SUPPORTED_MIME_TYPES)),
            "dest_ext": _map_case(mime, SUPPORTED_MIME_TYPES, None).cast(
                "string"
            ),
            "export_format": _map_case(
                mime, GOOGLE_DOCS_EXPORT_FORMATS, None
            ).cast("string"),
            "send_to_llamaparse": mime.isin(LLAMAPARSE_MIME_TYPES),
            "text_decodable": mime.isin(TEXT_DECODABLE_MIME_TYPES),
        }
    )


def file_type_selected(
    ext: Column, mime: Column, file_types: list[str]
) -> Column:
    """``scan_drive`` selection (:519-536): lowercased extension in
    the requested set, or a requested Google pseudo-extension whose
    MIME matches."""
    want = {e.strip().lower() for e in file_types if e}
    cond = ext.isin(list(want))
    for gext, gmt in GDOC_PSEUDO_EXTENSIONS.items():
        if gext in want:
            cond = cond | (mime == gmt)
    return cond


# -- LlamaParse client-side helpers (llamaparse_service.py:284-300, 395-409) --

# Suffix → MIME, probed IN ORDER with endswith on the lowercased
# filename (so 'archive.tar.pdf' is a pdf and 'x.htm'/'x.html' both
# map to text/html); anything else is application/octet-stream.
INFER_MIME_SUFFIXES: tuple[tuple[str, str], ...] = (
    (".pdf", "application/pdf"),
    (".docx", "application/vnd.openxmlformats-officedocument"
              ".wordprocessingml.document"),
    (".doc", "application/msword"),
    (".pptx", "application/vnd.openxmlformats-officedocument"
              ".presentationml.presentation"),
    (".xlsx", "application/vnd.openxmlformats-officedocument"
              ".spreadsheetml.sheet"),
    (".txt", "text/plain"),
    (".html", "text/html"),
    (".htm", "text/html"),
)
INFER_MIME_DEFAULT = "application/octet-stream"


def infer_mime(name: Column) -> Column:
    """``LlamaParseService._infer_mime`` (:284-300) as one CASE
    chain."""
    low = F.lower(name)
    out = F.lit(INFER_MIME_DEFAULT)
    for suffix, mime in reversed(INFER_MIME_SUFFIXES):
        out = F.when(low.endswith(suffix), F.lit(mime)).otherwise(out)
    return out


def infer_mime_sql(name_expr: str) -> str:
    """DuckDB twin generated from the same suffix table."""
    branches = " ".join(
        f"WHEN ends_with(lower({name_expr}), '{s}') THEN '{m}'"
        for s, m in INFER_MIME_SUFFIXES
    )
    return f"CASE {branches} ELSE '{INFER_MIME_DEFAULT}' END"


def normalized_markdown(markdown: Column, content: Column, md: Column) -> Column:
    """``_normalize_response`` markdown coalesce (:399): Python
    ``or`` chains skip EMPTY strings, not just None — an empty
    'markdown' field falls through to 'content' then 'md' (quirk
    preserved); all-falsy yields NULL."""
    def _nonempty(c: Column) -> Column:
        return F.when(c.isNotNull() & (F.length(c) > 0), c)

    return F.coalesce(
        _nonempty(markdown), _nonempty(content), _nonempty(md)
    )


def normalized_markdown_sql(m: str, c: str, d: str) -> str:
    ne = "CASE WHEN {x} IS NOT NULL AND length({x}) > 0 THEN {x} END"
    return (
        "coalesce("
        + ", ".join(ne.format(x=x) for x in (m, c, d))
        + ")"
    )
