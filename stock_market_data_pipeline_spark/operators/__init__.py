"""Operator library: pure DataFrame -> DataFrame functions.

Each module maps to a SURVEY.md §2 operator family; extensions for
LLM-training-data pipelines live in dedup/similarity/textstats/multimodal.
"""
