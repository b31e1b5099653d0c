class SimulationManager:
    """Red light until t = 10.0, then green; finish past the
    intersection or after 70.0 s."""

    RED = 0
    GREEN = 2

    def __init__(self, sim):
        pass

    def update(self, sim):
        for tl in sim.traffic_lights:
            tl.state = self.RED if sim.t < 10.0 else self.GREEN
        if sim.ego.x > 419.18313218303706 or sim.t > 70.0:
            sim.finished = True
