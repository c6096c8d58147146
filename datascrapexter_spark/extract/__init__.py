from .config import FieldConfig, ScraperConfig, load_config
from .fields import extract_field, extract_all, FieldError
from .engine import extract_fields_df, extraction_output_schema

__all__ = [
    "FieldConfig", "ScraperConfig", "load_config",
    "extract_field", "extract_all", "FieldError",
    "extract_fields_df", "extraction_output_schema",
]
