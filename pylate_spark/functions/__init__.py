from pylate_spark.functions.tokenize import (
    TOKEN_PATTERN,
    terms_long,
    tokenize_py,
    tokenize_udf,
)

__all__ = ["TOKEN_PATTERN", "terms_long", "tokenize_py", "tokenize_udf"]
