"""Training-data operator library: text analysis, deduplication, similarity
search, multimodal plumbing — first-class components alongside the rollup
engine (see repo README; each has a ``queries()`` entry in ``__ray_entry__``).
"""
