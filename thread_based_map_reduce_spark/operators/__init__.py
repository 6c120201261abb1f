"""Operator modules. Imported for side effects by plans.catalog._load_all —
each module registers its named queries (Spark builder + DuckDB oracle)
into the catalog."""
