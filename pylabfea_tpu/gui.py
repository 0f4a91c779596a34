"""Minimal tkinter GUI: composite (elastic inclusion) model parameter form;
builds the model, solves, and shows field plots.

Unlike the reference (which runs ``app.mainloop()`` at import), the app only
starts when ``main()`` is called::

    python -m pylabfea_tpu.gui
"""
import numpy as np


def self_closing_message(msg, timeout=2000):
    import tkinter as tk
    root = tk.Tk()
    root.title("Info")
    tk.Label(root, text=msg, padx=20, pady=20).pack()
    root.after(timeout, root.destroy)
    root.mainloop()


def add_label_and_entry(frame, row, text, default):
    import tkinter as tk
    tk.Label(frame, text=text).grid(row=row, column=0, sticky='w')
    var = tk.StringVar(value=str(default))
    tk.Entry(frame, textvariable=var, width=12).grid(row=row, column=1)
    return var


class UserInterface:
    """Parameter form for a 2-section inclusion model."""

    def __init__(self, master):
        import tkinter as tk
        self.master = master
        master.title("pylabfea_tpu — composite model")
        frame = tk.Frame(master, padx=10, pady=10)
        frame.pack()
        self.e_mat = add_label_and_entry(frame, 0, "E matrix (MPa)", 100.e3)
        self.nu_mat = add_label_and_entry(frame, 1, "nu matrix", 0.27)
        self.e_inc = add_label_and_entry(frame, 2, "E inclusion (MPa)", 3.e3)
        self.nu_inc = add_label_and_entry(frame, 3, "nu inclusion", 0.3)
        self.nel = add_label_and_entry(frame, 4, "elements per side", 18)
        self.strain = add_label_and_entry(frame, 5, "applied strain", 0.01)
        tk.Button(frame, text="Run", command=self.run).grid(row=6, column=0)
        tk.Button(frame, text="Quit", command=master.destroy).grid(row=6,
                                                                   column=1)

    def run(self):
        import pylabfea_tpu as FE
        NX = NY = int(self.nel.get())
        n1, n2 = NX // 3, 2 * (NX // 3)
        el = np.ones((NX, NY))
        el[n1:n2, n1:n2] = 2
        mat1 = FE.Material(num=1)
        mat1.elasticity(E=float(self.e_mat.get()), nu=float(self.nu_mat.get()))
        mat2 = FE.Material(num=2)
        mat2.elasticity(E=float(self.e_inc.get()), nu=float(self.nu_inc.get()))
        fe = FE.Model(dim=2, planestress=False)
        fe.geom(sect=2, LX=4., LY=4.)
        fe.assign([mat1, mat2])
        fe.bcbot(0.)
        fe.bcright(0., 'force')
        fe.bcleft(0., 'force')
        fe.bctop(float(self.strain.get()) * fe.leny, 'disp')
        fe.mesh(elmts=el, NX=NX, NY=NY)
        hh = [no in fe.nobot for no in fe.noleft]
        noc = np.nonzero(hh)[0]
        fe.bcnode(noc, 0., 'disp', 'x')  # fix corner against rigid motion
        fe.solve()
        for fsel in ('mat', 'stress2', 'seq', 'strain2', 'ux'):
            fe.plot(fsel, mag=5)


def main():  # pragma: no cover
    import tkinter as tk
    root = tk.Tk()
    UserInterface(root)
    root.mainloop()


if __name__ == '__main__':  # pragma: no cover
    main()
