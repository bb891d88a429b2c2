from wordcount_spark.sources.readers import TABLES, load_table, load_text_corpus, register_views

__all__ = ["TABLES", "load_table", "load_text_corpus", "register_views"]
