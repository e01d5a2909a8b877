from mopper_spark.functions.encoding import pct_encode, pct_encode_series
from mopper_spark.functions.iri import (
    is_valid_uri,
    is_valid_uri_reference,
    iri_finalize,
)
from mopper_spark.functions.templates import (
    TemplateParseError,
    parse_template,
    remove_join_alias_prefix,
)

__all__ = [
    "pct_encode",
    "pct_encode_series",
    "is_valid_uri",
    "is_valid_uri_reference",
    "iri_finalize",
    "parse_template",
    "remove_join_alias_prefix",
    "TemplateParseError",
]
