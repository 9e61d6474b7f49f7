from readability_spark.dom.node import (  # noqa: F401
    Comment,
    Document,
    Element,
    Node,
    Text,
)
from readability_spark.dom.parser import parse_html  # noqa: F401
from readability_spark.dom.serializer import inner_html, outer_html  # noqa: F401
