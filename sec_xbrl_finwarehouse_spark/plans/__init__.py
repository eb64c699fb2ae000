from .api_queries import company_profile, company_ratios, screener
from .ratios import compute_ratios
from .statements import build_statements

__all__ = [
    "build_statements",
    "compute_ratios",
    "company_profile",
    "company_ratios",
    "screener",
]
