"""Engine-path operator keys (compressed index + WAND) — filled in at M3/M4.

These exercise the real physical operators (salted repartition-sort, block
encoding, block-max WAND) end-to-end; most are non-SQL-expressible and get
rows-only driver checks, with pytest property tests carrying the
correctness burden (WAND ≡ exhaustive oracle).
"""

from __future__ import annotations
