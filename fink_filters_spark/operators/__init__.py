"""DataFrame -> DataFrame operators (SURVEY §7 layer 3)."""
