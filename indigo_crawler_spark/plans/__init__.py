"""Query plans: bootstrap, the scheduler round (EP1), resume (EP2)."""
