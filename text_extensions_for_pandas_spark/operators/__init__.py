"""Spanner-algebra operators + scale operators (dedup, similarity).

Every operator is ``DataFrame -> DataFrame`` building a lazy Catalyst plan.
"""
