"""Column-expression function library (parsers, string/time helpers).

Everything here returns Catalyst expressions — JVM-side, codegen-friendly;
no Python UDFs. The reference's scalar surface (SURVEY §2.8) is covered by
Spark built-ins; this package adds the structured-text parsers.
"""
