"""Minimal driver-side inflection (config-time only — never a row function).

The reference leans on ActiveSupport inflections for link naming
(lib/dionysus/consumer/deserializer.rb:130 ``name.singularize``,
lib/dionysus/producer/serializer.rb:48-50 ``classify``). We only need
the handful of patterns its payloads use; anything irregular is
supplied via the registry's ``overrides``.
"""

from __future__ import annotations

_IRREGULAR = {
    "people": "person",
    "children": "child",
    "data": "datum",
}


def singularize(word: str, overrides: dict[str, str] | None = None) -> str:
    if overrides and word in overrides:
        return overrides[word]
    if word in _IRREGULAR:
        return _IRREGULAR[word]
    if word.endswith("ies") and len(word) > 3:
        return word[:-3] + "y"
    if word.endswith("sses") or word.endswith("shes") or word.endswith("ches"):
        return word[:-2]
    if word.endswith("s") and not word.endswith("ss"):
        return word[:-1]
    return word


def classify(word: str, overrides: dict[str, str] | None = None) -> str:
    """``bookings_fees`` -> ``BookingsFee`` (reference: classify)."""
    if overrides and word in overrides:
        return overrides[word]
    parts = word.split("_")
    parts = parts[:-1] + [singularize(parts[-1])]
    return "".join(p.capitalize() for p in parts)


def underscore(word: str) -> str:
    """``BookingsFee`` -> ``bookings_fee``."""
    out = []
    for i, ch in enumerate(word):
        if ch.isupper() and i > 0:
            out.append("_")
        out.append(ch.lower())
    return "".join(out)
