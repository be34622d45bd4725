"""Pipeline stages (SURVEY §2.2-§2.7), each a Dataset → Dataset transform."""
