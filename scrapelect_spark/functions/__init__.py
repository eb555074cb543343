"""Value model, filter library, DOM and CSS matching for the scrp engine.

Everything in this package is plain Python with no Spark dependency so it
can run inside Arrow-batched UDF workers without pulling in the driver.
"""
