class SimulationManager:
    """Finish once the ego passes x = 419.18313218303706 (or after 60.0 s)."""

    def __init__(self, sim):
        pass

    def update(self, sim):
        if sim.ego.x > 419.18313218303706 or sim.t > 60.0:
            sim.finished = True
