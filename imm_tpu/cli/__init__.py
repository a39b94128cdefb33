"""Command-line entry points: train / eval / generate.

Mirrors the reference's ``scripts/train.py`` / ``scripts/test.py`` surface
(SURVEY.md §1 L5): preset or YAML config + dotted overrides.
"""
