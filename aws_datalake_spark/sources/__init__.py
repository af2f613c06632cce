"""Sources & sinks (SURVEY.md §2.1): typed readers/writers over the
lake's formats, zone layout helpers, and the JSON-file config store
standing in for the reference's DynamoDB config tables."""
