"""Sources and sinks for RDF syntaxes and tables."""
