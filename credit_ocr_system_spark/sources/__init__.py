from .pages import PAGES_SCHEMA, gen_page, pages_df, write_pages_parquet

__all__ = ["PAGES_SCHEMA", "gen_page", "pages_df", "write_pages_parquet"]
