from scrapy_rs_spark.functions.url import (
    canonicalize_url_udf,
    urljoin_udf,
    with_url_identity,
    url_hash_expr,
)
from scrapy_rs_spark.functions.text import extract_links_udf, extract_text_udf

__all__ = [
    "canonicalize_url_udf",
    "urljoin_udf",
    "with_url_identity",
    "url_hash_expr",
    "extract_links_udf",
    "extract_text_udf",
]
