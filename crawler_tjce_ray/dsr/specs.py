"""Record-type specs: field configs and positional mappings.

These are re-declarations (not copies) of the reference's declarative
config: the precatório CSV↔API field map (config.py:106-162), the
edital positional map (crawler/edital_crawler.py:472-487) and the
pagamento positional map (crawler/pagamentos_crawler.py:481-516).
"""

from __future__ import annotations

# --- precatórios ------------------------------------------------------------
# csv_field -> {type, default, api_name}; order is the CSV column order.
PRECATORIO_CSV_FIELDS = [
    "ordem",
    "processo",
    "comarca",
    "ano_orcamento",
    "natureza",
    "data_cadastro",
    "tipo_classificacao",
    "valor_original",
    "valor_atual",
    "situacao",
]

PRECATORIO_FIELD_MAPPING: dict[str, dict] = {
    "ordem": {"type": "int", "default": "0", "api_name": "dfslcp_num_ordem"},
    "processo": {"type": "processo", "default": None, "api_name": "dfslcp_dsc_proc_precatorio"},
    "comarca": {"type": "str", "default": "-", "api_name": "dfslcp_dsc_comarca"},
    "ano_orcamento": {"type": "int", "default": "2024", "api_name": "dfslcp_num_ano_orcamento"},
    "natureza": {"type": "str", "default": "-", "api_name": "dfslcp_dsc_natureza"},
    "data_cadastro": {"type": "date", "default": None, "api_name": "dfslcp_dat_cadastro"},
    "tipo_classificacao": {"type": "str", "default": "-", "api_name": "dfslcp_dsc_tipo_classificao"},
    "valor_original": {"type": "float", "default": "0.0", "api_name": "dfslcp_vlr_original"},
    "valor_atual": {"type": "Decimal", "default": "0.0", "api_name": "ValorAtualFormatado"},
    "situacao": {"type": "str", "default": "-", "api_name": "dfslcp_dsc_sit_precatorio"},
}

# api_name -> {csv_field, type, default} (crawler/crawler.py:764-772)
API_TO_CSV: dict[str, dict] = {
    attrs["api_name"]: {"csv_field": f, "type": attrs["type"], "default": attrs["default"]}
    for f, attrs in PRECATORIO_FIELD_MAPPING.items()
}

# --- editais ----------------------------------------------------------------
# Positional: (name, type, dict_name) per schema index
# (crawler/edital_crawler.py:472-487).
EDITAL_FIELDS = [
    ("ordem", "int", None),
    ("ano_orcamento", "int", "D0"),
    ("natureza", "str", "D1"),
    ("data_cadastro", "str", "D2"),
    ("precatorio", "str", "D3"),
    ("status", "str", "D4"),
    ("valor", "Decimal", None),
]

EDITAL_CSV_FIELDS = [
    "ordem",
    "ano_orcamento",
    "natureza",
    "data_cadastro",
    "precatorio",
    "status",
    "valor",
]

# --- pagamentos -------------------------------------------------------------
# Positional: (name, type, dict_name) per schema index
# (crawler/pagamentos_crawler.py:481-516).
PAGAMENTO_FIELDS = [
    ("quantidade", "int", None),
    ("modalidade", "str", "D0"),
    ("natureza", "str", "D1"),
    ("exercicio", "int", "D2"),
    ("data_protocolo", "str", "D3"),
    ("precatorio", "str", "D4"),
    ("credor_beneficiario", "str", "D5"),
    ("tipo", "str", "D6"),
    ("data_pagamento", "str", "D7"),
    ("cpf_cnpj", "str", "D8"),
    ("valor_bruto", "Decimal", None),
    ("previdencia", "Decimal", None),
    ("irrf", "Decimal", None),
    ("honorarios", "Decimal", None),
    ("valor_bruto_contratual", "Decimal", None),
    ("rra", "Decimal", None),
    ("valor_liquido", "Decimal", None),
]

PAGAMENTO_CSV_FIELDS = [name for name, _, _ in PAGAMENTO_FIELDS]

# Descriptor Select names.  The live API wraps aggregated columns in
# Sum(...) (examples/response.json), which the reference's broken
# agg-unwrapping regex fails to resolve (see decode.get_base_field_name)
# — those columns then keep their defaults.  The synthetic corpus
# defaults to the PLAIN variant (every column resolves; the reference
# decoder on the same bytes consumes every delta value identically),
# and the SUM-wrapped variant is available to exercise the quirk.
PRECATORIO_SELECT_NAMES_SUM = [
    "dfslcp_SAPRE_LISTA_CRONO_PRECATORIO.dfslcp_dsc_proc_precatorio",
    "Sum(dfslcp_SAPRE_LISTA_CRONO_PRECATORIO.dfslcp_num_ano_orcamento)",
    "dfslcp_SAPRE_LISTA_CRONO_PRECATORIO.dfslcp_dsc_natureza",
    "dfslcp_SAPRE_LISTA_CRONO_PRECATORIO.dfslcp_dat_cadastro Hierarquia.dfslcp_dat_cadastro",
    "dfslcp_SAPRE_LISTA_CRONO_PRECATORIO.dfslcp_dsc_tipo_classificao",
    "Sum(dfslcp_SAPRE_LISTA_CRONO_PRECATORIO.dfslcp_vlr_original)",
    "Sum(dfslcp_SAPRE_LISTA_CRONO_PRECATORIO.dfslcp_num_ordem)",
    "dfslcp_SAPRE_LISTA_CRONO_PRECATORIO.dfslcp_dsc_sit_precatorio",
    "dfslcp_SAPRE_LISTA_CRONO_PRECATORIO.dfslcp_dsc_comarca",
    "dfslcp_SAPRE_LISTA_CRONO_PRECATORIO.ValorAtualFormatado",
]

PRECATORIO_SELECT_NAMES_PLAIN = [
    "dfslcp_SAPRE_LISTA_CRONO_PRECATORIO.dfslcp_dsc_proc_precatorio",
    "dfslcp_SAPRE_LISTA_CRONO_PRECATORIO.dfslcp_num_ano_orcamento",
    "dfslcp_SAPRE_LISTA_CRONO_PRECATORIO.dfslcp_dsc_natureza",
    "dfslcp_SAPRE_LISTA_CRONO_PRECATORIO.dfslcp_dat_cadastro",
    "dfslcp_SAPRE_LISTA_CRONO_PRECATORIO.dfslcp_dsc_tipo_classificao",
    "dfslcp_SAPRE_LISTA_CRONO_PRECATORIO.dfslcp_vlr_original",
    "dfslcp_SAPRE_LISTA_CRONO_PRECATORIO.dfslcp_num_ordem",
    "dfslcp_SAPRE_LISTA_CRONO_PRECATORIO.dfslcp_dsc_sit_precatorio",
    "dfslcp_SAPRE_LISTA_CRONO_PRECATORIO.dfslcp_dsc_comarca",
    "dfslcp_SAPRE_LISTA_CRONO_PRECATORIO.ValorAtualFormatado",
]
