"""Scalar function surface (SURVEY.md §2.B B20–B25).

In Mrs every scalar transform is arbitrary Python inside ``map``; here each
family is the built-in JVM expression set (whole-stage codegen, no Python
worker round-trip).
"""
