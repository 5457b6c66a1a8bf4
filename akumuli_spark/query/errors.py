"""Query-language errors, mirroring the reference's parse/validation error
surface (AKU_EQUERY_PARSING_ERROR & co)."""


class QueryParseError(ValueError):
    """Raised for malformed query JSON — unknown fields, bad ranges,
    unknown functions (reference: queryparser.cpp:934-985 whitelist)."""


class QueryValidationError(ValueError):
    """Raised for structurally valid but semantically invalid queries
    (e.g. raw-data apply node after group-aggregate —
    reference: queryprocessor.cpp:38-58)."""
