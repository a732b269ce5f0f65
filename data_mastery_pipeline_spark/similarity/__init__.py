"""Approximate-nearest-neighbor search over embedding columns
(BASELINE.json scope): brute-force cosine top-k baseline + sign-LSH
bucketed scale path."""
