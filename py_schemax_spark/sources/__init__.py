from py_schemax_spark.sources.datagen import (
    gen_pages,
    gen_lang_dim,
    gen_domain_dim,
    write_pages,
    LANGS,
)

__all__ = ["gen_pages", "gen_lang_dim", "gen_domain_dim", "write_pages", "LANGS"]
