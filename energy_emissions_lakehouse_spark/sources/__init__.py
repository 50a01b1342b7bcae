"""Sources & sinks (SURVEY.md §2.1): file formats and JDBC."""
