"""LLM-data-pipeline extension operators (BASELINE.json north star).

Beyond the reference's CDC surface: deduplication, similarity search,
text analysis, multimodal column handling — each designed partition-parallel
for 100 TB (see module docstrings for the scale strategy of every operator).
"""
