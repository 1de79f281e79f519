"""Format / type regex tables and predicate builders.

Semantics mirror the reference's type-regexes (/root/reference/src/
json_schema/core.clj:203,223,246,258,270,282,294), its `format-regexps`
table (core.clj:1236-1255) and the functional format checks `format-fns`
(core.clj:1257-1317).  The reference applies type regexes with full-match
(`re-matches`) and `format`/`pattern` regexes with substring find
(`re-find`, core.clj:1336,1361); Spark's ``rlike`` is find-semantics, so
full-match regexes are anchored here.

Both the reference (Clojure) and Spark run java.util.regex — exact dialect
parity on the Column path.  The Python backend uses ``re`` (close enough
for the suite under the reference's own ECMA-262 skip-lists, see
/root/reference/test/json_schema/v3_test.clj:86-93).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- type regexes (reference applies with re-matches → anchored for rlike) ---
TYPE_REGEX = {
    "date": r"^-?[0-9]{4}(-(0[1-9]|1[0-2])(-(0[0-9]|[1-2][0-9]|3[0-1]))?)?$",
    "datetime": r"^-?[0-9]{4}(-(0[1-9]|1[0-2])(-(0[0-9]|[1-2][0-9]|3[0-1])(T([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9](\\.[0-9]+)?(Z|[+-]((0[0-9]|1[0-3]):[0-5][0-9]|14:00))?)?)?)?$",
    "time": r"^([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9](\\.[0-9]+)?$",
    # reference uri type regex is applied with re-matches but is unanchored at
    # the end — emulate by anchoring start only
    "uri": r"^([^:]+)://[-a-zA-Z0-9+&@#/%?=~_|!:,.;]*[-a-zA-Z0-9+&@#/%=~_|]$",
    "oid": r"^[[0-9]+\.]*$",
    "uuid": r"^([a-f\d]{8}(-[a-f\d]{4}){3}-[a-f\d]{12}?)$",
    "email": r"^[^@]+@[^.]+\..*$",
}

# --- `format` keyword regex table (applied with find; reference anchors most) ---
FORMAT_REGEX = {
    "date": r"^(\d{4})-(\d{2})-(\d{2})$",
    "time": r"^(\d{2}):(\d{2}):(\d{2})(\.\d+)?([zZ]|(\+|\-)(\d{2}):(\d{2}))?$",
    "email": r"[^@]+@[^.]+\..*",
    "hostname": r"^([-a-zA-Z0-9]{0,64}\.)+[-a-zA-Z0-9]{0,64}$",
    "host-name": r"^([-a-zA-Z0-9]{0,64}\.)+[-a-zA-Z0-9]{0,64}$",
    "ipv4": r"^(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$",
    "ip-address": r"^(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$",
    "ipv6": r"^(([0-9a-fA-F]{1,4}:){7,7}[0-9a-fA-F]{1,4}|([0-9a-fA-F]{1,4}:){1,7}:|([0-9a-fA-F]{1,4}:){1,6}:[0-9a-fA-F]{1,4}|([0-9a-fA-F]{1,4}:){1,5}(:[0-9a-fA-F]{1,4}){1,2}|([0-9a-fA-F]{1,4}:){1,4}(:[0-9a-fA-F]{1,4}){1,3}|([0-9a-fA-F]{1,4}:){1,3}(:[0-9a-fA-F]{1,4}){1,4}|([0-9a-fA-F]{1,4}:){1,2}(:[0-9a-fA-F]{1,4}){1,5}|[0-9a-fA-F]{1,4}:((:[0-9a-fA-F]{1,4}){1,6})|:((:[0-9a-fA-F]{1,4}){1,7}|:)|fe80:(:[0-9a-fA-F]{0,4}){0,4}%[0-9a-zA-Z]{1,}|::(ffff(:0{1,4}){0,1}:){0,1}((25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])\.){3,3}(25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])|([0-9a-fA-F]{1,4}:){1,4}:((25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])\.){3,3}(25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9]))$",
    "color": r"^(#(?:[0-9a-fA-F]{2}){2,3}|#[0-9a-fA-F]{3}|(?:rgba?|hsla?)\((?:\d+%?(?:deg|rad|grad|turn)?(?:,|\s)+){2,3}[\s/]*[\d.]+%?\)|black|silver|gray|white|maroon|red|purple|fuchsia|green|lime|olive|yellow|navy|blue|teal|aqua|orange)$",
    "idn-hostname": r"^.*$",
    "iri-reference": r"^.*$",
    "iri": r"^.*$",
    "idn-email": r"^.*@.*$",
    "relative-json-pointer": r"^.*$",
    "unknownformat": r"^.*$",
    "unknown": r"^.*$",
    "uri-reference": r".*",
    "uri-template": r".*",
}

# formats the reference checks functionally (format-fns, core.clj:1309-1317)
FUNCTIONAL_FORMATS = (
    "regex",
    "uri",
    "uri-reference",
    "uri-template",
    "iri",
    "iri-reference",
    "date-time",
    "json-pointer",
)


def uri_ok(col: Column) -> Column:
    """Column translation of the reference's valid-uri? predicate chain
    (core.clj:1279-1286): a URI is invalid iff it starts with '/' or '\\\\',
    lacks ':', contains a space, or looks like http(s)://<digits>:..."""
    bad = (
        col.startswith("/")
        | col.startswith("\\")
        | ~col.contains(":")
        | col.contains(" ")
        | col.rlike(r"^http(s)?://\d+:")
    )
    return ~bad


def uri_reference_ok(col: Column) -> Column:
    """valid-uri-reference? (core.clj:1288-1291): invalid iff contains '\\\\'
    or a space."""
    return ~(col.contains("\\") | col.contains(" "))


def uri_template_ok(col: Column) -> Column:
    """valid-uri-template? (core.clj:1296-1298): invalid iff an unclosed
    '{...' trails the string."""
    return ~col.rlike(r"\{[^}]+$")


#: same structure as the Python backend's _DT_RE (ISO_DATE_TIME: time part
#: required, seconds optional, case-sensitive T/Z, offset <= 18:00)
_DT_STRUCT_RE = (
    r"^-?\d{4}-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])"
    r"T([01]\d|2[0-3]):[0-5]\d(:[0-5]\d(\.\d{1,9})?)?"
    r"(Z|[+-](0\d|1[0-8]):[0-5]\d(:[0-5]\d)?(\[[^\]]+\])?)?$"
)


def date_time_ok(col: Column) -> Column:
    """valid-date-time? (core.clj:1301-1306) parses with ISO_DATE_TIME:
    structural regex (time REQUIRED, seconds optional, strict case,
    bounded offsets — identical to the Python backend's _DT_RE) plus a
    calendar-day check via try_to_date on the extracted date part (the
    smart resolver rejects Feb 30); proleptic negative years pass on
    structure alone, mirroring the Python backend."""
    structural = col.rlike(_DT_STRUCT_RE)
    date_part = F.regexp_extract(col, r"^(\d{4}-\d{2}-\d{2})T", 1)
    calendar_ok = F.when(
        col.startswith("-"), F.lit(True)
    ).otherwise(F.try_to_date(date_part, "yyyy-MM-dd").isNotNull())
    return F.coalesce(structural & calendar_ok, F.lit(False))


def format_ok(col: Column, fmt: str) -> Column | None:
    """Boolean Column for `format: fmt` over a string column; None when the
    format needs the Python backend (`regex`, `json-pointer`)."""
    if fmt == "uri" or fmt == "iri":
        return uri_ok(col)
    if fmt == "uri-reference" or fmt == "iri-reference":
        return uri_reference_ok(col)
    if fmt == "uri-template":
        return uri_template_ok(col)
    if fmt == "date-time":
        return date_time_ok(col)
    if fmt in ("regex", "json-pointer"):
        return None
    pat = FORMAT_REGEX.get(fmt)
    if pat is None:
        return None
    return col.rlike(pat)
