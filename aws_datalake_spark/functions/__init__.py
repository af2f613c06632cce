"""Column-function library: crypto UDFs, decomposed-datetime helpers,
text functions (SURVEY.md §2.7)."""
