"""Source/sink codecs beyond Parquet/CSV/JSON (SURVEY §2.1): the Solr
XML update format (S4) and the javabin wire format (S5), each as a
distributed encode/decode pair over ``mapInPandas``."""
