from .config import FieldConfig, ScraperConfig, load_config
from .fields import extract_field, extract_all, FieldError
from .engine import extract_fields_df, extraction_output_schema
from .config_validation import validate_with_details, ValidationResult
from .config_cache import ConfigCache, load_config_cached, generate_template

__all__ = [
    "FieldConfig", "ScraperConfig", "load_config",
    "extract_field", "extract_all", "FieldError",
    "extract_fields_df", "extraction_output_schema",
    "validate_with_details", "ValidationResult",
    "ConfigCache", "load_config_cached", "generate_template",
]
