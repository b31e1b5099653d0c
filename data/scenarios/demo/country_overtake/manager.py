class SimulationManager:
    """Finish once the ego passes x = 183.9864526757998 (or after 45.0 s)."""

    def __init__(self, sim):
        pass

    def update(self, sim):
        if sim.ego.x > 183.9864526757998 or sim.t > 45.0:
            sim.finished = True
