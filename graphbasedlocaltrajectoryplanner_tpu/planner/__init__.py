"""Online planner: per-tick path generation, velocity planning, stateful
handler and the public facade."""
