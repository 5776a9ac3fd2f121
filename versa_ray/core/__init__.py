from .irihelpers import (
    I,
    absolutize,
    is_absolute,
    matches_uri_ref_syntax,
    percent_encode,
    relativize,
)
from .hashing import (
    FROM_EMPTY_64BIT_HASH,
    OrderedJsonEncoder,
    VERSA_BASEIRI,
    VFPRINT_REL,
    VLABEL_REL,
    VTYPE_REL,
    fingerprint_text,
    resource_id,
    simple_hashstring,
)
from .canon import (
    EMPTY_ATTRS,
    LINK_COLUMNS,
    LINK_SCHEMA,
    attrs_from_json,
    attrs_to_json,
    canonical_json,
    link_to_row,
    row_to_link,
)

# Positional constants for link tuples, mirroring the reference's
# public API (tools/py/__init__.py:10-13).
ORIGIN = RESOURCE = SUBJECT = 0
RELATIONSHIP = 1
TARGET = VALUE = 2
ATTRIBUTES = 3

RDF_NS = I("http://www.w3.org/1999/02/22-rdf-syntax-ns#")
RDFS_NS = I("http://www.w3.org/2000/01/rdf-schema#")
RDF_TYPE_REL = I(RDF_NS + "type")
VERSA_NULL = I(VERSA_BASEIRI + "null")
