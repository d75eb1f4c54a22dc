from .scalar import (  # noqa: F401
    amount_bucket,
    anonymize_user,
    derive_email,
    exchange_rate_for_priority,
    money,
)
