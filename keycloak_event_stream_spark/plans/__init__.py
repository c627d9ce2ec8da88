"""Query plans: fluent builders compiling to DataFrame logical plans.

The reference's de-facto logical plan is a mutable builder emitting a SQL
string for Athena (``AthenaEventQuery.java:22-31,136-159``). Here the
builder compiles to a lazy DataFrame — Catalyst is the optimizer the
reference outsourced to Athena.
"""
