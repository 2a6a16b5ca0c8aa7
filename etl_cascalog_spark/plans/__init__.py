"""Pipeline/plan layer: declarative report specs and trgx tree algebra."""
