"""Simulation dummies for closed-loop testing (reference
graph_ltpl/testing_tools/): ideal-controller vehicle model and opponent
object-list generator."""
