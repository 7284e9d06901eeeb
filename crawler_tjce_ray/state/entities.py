"""Entity slug↔official-name registry (M9, SURVEY.md §2.10).

Re-expresses the reference's static entity-mapping module
(schemas/entity_mapping.py:32-295): the slug → exact official
(accent-carrying) API name lookup with ``unslugify`` fallback, the
reverse lookup, slug validation, and the ``add_entity_mapping``
runtime-extension hook.

Architecture difference from the reference: instead of a hardcoded
~200-entry table, the registry *seeds itself from the crawled
entity list* (the distinct-values chain decoded by
``decode_entities_page``, reference
schemas/entity_mapping_crawler.py:312-340) — the authoritative source
the reference's table was itself transcribed from — and users extend
it at runtime exactly like the reference's ``add_entity_mapping``.
For distributed lookups the mapping dict is small (hundreds of
entries): ``ray.put`` it once and resolve inside ``map_batches``.
"""

from __future__ import annotations

from collections.abc import Iterable

from crawler_tjce_ray.functions.text import slugify, unslugify


class EntityRegistry:
    """Bidirectional slug↔official-name map with slugify fallback.

    The invariant mirrored from the reference: official names may
    carry accents/punctuation the slug cannot encode ("MUNICÍPIO DE
    TAUÁ" → "municipio-de-taua"), so the slug→name direction MUST go
    through the registry — ``unslugify`` alone would return the lossy
    "MUNICIPIO DE TAUA".
    """

    def __init__(self, official_names: Iterable[str] = ()):
        self._by_slug: dict[str, str] = {}
        self._by_name: dict[str, str] = {}
        for name in official_names:
            self.register_official_name(name)

    def __len__(self) -> int:
        return len(self._by_slug)

    def register_official_name(self, official_name: str) -> str:
        """Derive the slug and register both directions; returns the
        slug (the reference's get_and_save_entities mapping pass,
        entity_mapping_crawler.py:329-336)."""
        slug = slugify(official_name)
        if slug:
            self._by_slug[slug] = official_name
            self._by_name[official_name] = slug
        return slug

    def add_entity_mapping(self, slug: str, api_name: str) -> None:
        """Runtime user extension (parity: entity_mapping.py:292-295 —
        the input slug is normalized through slugify first)."""
        normalized = slugify(slug)
        self._by_slug[normalized] = api_name
        self._by_name[api_name] = normalized

    def validate_entity_slug(self, slug: str) -> bool:
        """True iff the (normalized) slug is a known entity
        (parity: entity_mapping.py:245-255)."""
        return slugify(slug) in self._by_slug

    def get_api_entity_name(self, slug_or_name: str) -> str:
        """Slug OR free-form name → the exact official API name;
        ``unslugify`` only as the unknown-entity fallback
        (parity: entity_mapping.py:258-276)."""
        normalized = slugify(slug_or_name)
        hit = self._by_slug.get(normalized)
        if hit is not None:
            return hit
        return unslugify(normalized)

    def get_entity_slug(self, api_name: str) -> str:
        """Official name → slug; slugify fallback for unknown names
        (parity: entity_mapping.py:279-289)."""
        hit = self._by_name.get(api_name)
        if hit is not None:
            return hit
        return slugify(api_name)

    def mapping(self) -> dict[str, str]:
        """The slug→official-name dict (broadcast this via ``ray.put``
        for in-map lookups)."""
        return dict(self._by_slug)

    @classmethod
    def from_entity_list(cls, names: Iterable[str]) -> "EntityRegistry":
        """Build from a crawled entity list, skipping the selector
        placeholders the list carries (they are kept in the CSV for
        golden parity but are not entities)."""
        return cls(n for n in names if not n.startswith("---"))

    @classmethod
    def from_corpus(cls, pages_path: str) -> "EntityRegistry":
        """Decode the corpus's entity-list chain and build the registry
        (the production seed path; the reference equivalent transcribes
        data/entidades_tjce.csv into its static table)."""
        from crawler_tjce_ray.pipelines.extract_all import extract_entities

        names = extract_entities(pages_path)["entidade"].tolist()
        return cls.from_entity_list(names)
