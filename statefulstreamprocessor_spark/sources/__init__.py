from .webtext import WEBTEXT_SCHEMA, generate_webtext, write_webtext_parquet

__all__ = ["WEBTEXT_SCHEMA", "generate_webtext", "write_webtext_parquet"]
