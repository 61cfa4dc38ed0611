"""Column-expression helpers shared across queries and operators."""
