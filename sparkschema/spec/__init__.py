"""Driver-side constraint-spec machinery: parsing, normalization, $ref
resolution, and the row-at-a-time semantics kernel used by the vectorized
JSON batch validator."""
