from crawler_tjce_ray.stages.extract import (
    EDITAL_SCHEMA,
    PAGAMENTO_SCHEMA,
    PRECATORIO_SCHEMA,
    ExtractEditais,
    ExtractPagamentos,
    ExtractPrecatorios,
    classify_url,
)

__all__ = [
    "PRECATORIO_SCHEMA",
    "EDITAL_SCHEMA",
    "PAGAMENTO_SCHEMA",
    "ExtractPrecatorios",
    "ExtractEditais",
    "ExtractPagamentos",
    "classify_url",
]
