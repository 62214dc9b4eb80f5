"""Column-expression function library (JVM-side where possible)."""
