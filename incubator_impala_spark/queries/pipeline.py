QUERIES: dict = {}
ORACLE_SQL: dict = {}
