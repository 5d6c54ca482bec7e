"""Scene representation (flat SoA tables) and the reference scene builders."""
