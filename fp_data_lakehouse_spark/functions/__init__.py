"""Column-expression kits: text analysis, vector math. All JVM-side
built-ins (no Python UDFs) so they stay inside whole-stage codegen."""
