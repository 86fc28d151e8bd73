from dp_search_data_importer_spark.functions.tokenize import (  # noqa: F401
    TOKEN_SPLIT_REGEX,
    code_term_freqs,
    simple_term_freqs,
    tokenize_code_expr,
    tokenize_expr,
)
