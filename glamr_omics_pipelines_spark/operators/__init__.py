"""Operator library: SURVEY.md §2 constructs as reusable DataFrame transforms.

Every function here takes and returns DataFrames (lazy logical plans) so that
Catalyst sees the whole pipeline — no driver-side materialization, no RDDs.
"""
