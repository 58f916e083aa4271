"""Operator library: every function is DataFrame -> DataFrame, lazy, and
expressed with native Spark SQL expressions (no Python row UDFs) so Catalyst
can push filters, prune columns, and keep the whole pipeline in
whole-stage-codegen. See SURVEY.md §2 for the operator inventory each module
covers.
"""
