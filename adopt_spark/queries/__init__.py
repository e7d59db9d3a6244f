"""Driver-contract query registry (queries() / oracle_sql())."""
